package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CryptoCodec
import graft.pipeline.{ColumnPolicy, PerValue, ProtectionPipeline}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full registry: (name, impl, oracle). Insertion order preserved. */
  def registry: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] =
    RelationalQueries.registry ++ ProtectedQueries.registry ++
      PipelineOpsQueries.registry

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(registry.map(t => t._1 -> t._2): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(registry.collect { case (n, _, Some(sql)) => n -> sql }: _*)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the whole engine: protect columns → equality join on
    * ciphertext → decrypt → relational aggregate.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val protected_ = ProtectionPipeline.encrypt(customer, Seq(
      ColumnPolicy("c_name", "entry-key", PerValue, CryptoCodec.Xor),
      ColumnPolicy("c_acctbal", "entry-key", PerValue, CryptoCodec.AesDet)))
    val decrypted = ProtectionPipeline.decrypt(protected_)
    decrypted.join(orders, col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"),
        min(col("c_name")).as("first_customer"))
      .orderBy("c_mktsegment")
  }
}
