package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared oracle-determinism helpers. Money aggregates run in exact integer
  * cents: `SUM(round(x*100)::BIGINT)` is order-independent and bit-identical
  * across engines, unlike floating-point summation. The Spark and SQL forms
  * here MUST stay in lockstep — they are two spellings of one definition.
  */
object QueryUtil {
  /** money → exact integer cents */
  def cents(c: Column): Column = round(c * 100).cast("long")
  /** fraction → exact integer basis points (0.07 → 7) */
  def pctInt(c: Column): Column = round(c * 100).cast("long")
  /** DuckDB spelling of [[cents]]/[[pctInt]] */
  val centsSql: String => String = x => s"CAST(round($x*100) AS BIGINT)"
}
