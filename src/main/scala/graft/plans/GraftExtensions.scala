package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.functions.{DecryptBlock, DecryptValue}

/** Plan-time access control — the engine's analog of the reference's
  * access-control stamping (`dbps_api_server.cpp:199-203`: user → role →
  * granted/denied; left TODO there, enforced here at ANALYSIS time as
  * SURVEY.md §2.4 A3 prescribes: "per-column policy check at plan time
  * (deny → analysis error)").
  *
  * A session opts in via `.withExtensions(new GraftExtensions)`; the check
  * rule walks every analyzed plan and rejects decryption with a key id the
  * session is not entitled to:
  *
  *  - `spark.graft.allowedKeys` — comma-separated allowlist; when set, any
  *    decrypt with a key outside it fails analysis.
  *  - `spark.graft.deniedKeys`  — comma-separated denylist; always wins.
  *
  * Enforcement at analysis (not execution) means a denied query never runs
  * a single task — on a 1000-executor job that is the difference between an
  * instant error and a cluster-wide scan that fails at the first row.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectCheckRule(spark => ProtectionPolicyCheck(spark))
  }
}

case class ProtectionPolicyCheck(spark: SparkSession) extends (LogicalPlan => Unit) {
  private def conf(key: String): Set[String] =
    spark.conf.getOption(key).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  override def apply(plan: LogicalPlan): Unit = {
    val allowed = conf("spark.graft.allowedKeys")
    val denied = conf("spark.graft.deniedKeys")
    if (allowed.isEmpty && denied.isEmpty) return
    plan.foreach { node =>
      node.expressions.foreach { e =>
        e.foreach {
          case d: DecryptValue => check(d.keyId, allowed, denied)
          case d: DecryptBlock => check(d.keyId, allowed, denied)
          case _ =>
        }
      }
    }
  }

  private def check(keyId: String, allowed: Set[String], denied: Set[String]): Unit = {
    if (denied.contains(keyId))
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_3104",
        Map("message" ->
          s"graft access control: decryption with key '$keyId' is denied for this session"),
        None)
    if (allowed.nonEmpty && !allowed.contains(keyId))
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_3104",
        Map("message" ->
          s"graft access control: key '$keyId' is not in this session's allowlist"),
        None)
  }
}
