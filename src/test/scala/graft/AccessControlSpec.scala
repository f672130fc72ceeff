package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CryptoCodec
import graft.functions.protect
import graft.plans.GraftExtensions
import graft.queries.GraftSession

/** Plan-time access control (SURVEY.md §2.4 A3): denied key → analysis
  * error before a single task runs.
  */
class AccessControlSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = GraftSession.builder("local[4]", 4)
      .withExtensions(new GraftExtensions).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def protectedDf = {
    import spark.implicits._
    Seq("alice", "bob").toDF("v")
      .withColumn("ct", protect.encrypt_value(col("v"), "secret-key",
        CryptoCodec.AesDet, "v"))
  }

  test("decryption with a denied key fails at analysis time") {
    spark.conf.set("spark.graft.deniedKeys", "secret-key")
    try {
      val e = intercept[AnalysisException] {
        protectedDf.withColumn("back", protect.decrypt_value(col("ct"),
          "secret-key", StringType, CryptoCodec.AesDet, "v")).collect()
      }
      assert(e.getMessage.contains("denied"))
    } finally spark.conf.unset("spark.graft.deniedKeys")
  }

  test("allowlist: keys outside it are rejected, inside it pass") {
    spark.conf.set("spark.graft.allowedKeys", "public-key")
    try {
      val e = intercept[AnalysisException] {
        protectedDf.withColumn("back", protect.decrypt_value(col("ct"),
          "secret-key", StringType, CryptoCodec.AesDet, "v")).collect()
      }
      assert(e.getMessage.contains("allowlist"))
      // a permitted key analyzes and runs
      import spark.implicits._
      val ok = Seq("x").toDF("v")
        .withColumn("ct", protect.encrypt_value(col("v"), "public-key",
          CryptoCodec.Xor, "v"))
        .withColumn("back", protect.decrypt_value(col("ct"), "public-key",
          StringType, CryptoCodec.Xor, "v"))
        .collect()
      assert(ok.head.getString(2) == "x")
    } finally spark.conf.unset("spark.graft.allowedKeys")
  }

  test("no confs set: everything passes (opt-in enforcement)") {
    val out = protectedDf.withColumn("back", protect.decrypt_value(col("ct"),
      "secret-key", StringType, CryptoCodec.AesDet, "v")).collect()
    assert(out.map(_.getString(2)).toSeq == Seq("alice", "bob"))
  }
}
