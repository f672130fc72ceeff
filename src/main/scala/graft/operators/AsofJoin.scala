package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (backward): for each left row, the single right row with the
  * greatest right-time ≤ left-time within the same key.
  *
  * Implementation composes built-ins (SURVEY preference order (a)): both
  * sides are tagged and unioned, then a single `last(_, ignoreNulls)` window
  * ordered by (time, side) carries the most recent right payload forward —
  * one shuffle on the key, no range cross-product, no custom physical node.
  * At scale this is the sort-merge-friendly formulation: Spark sorts each
  * key partition once; memory is O(1) per row (running last value), unlike
  * a range-join which can explode.
  *
  * Right rows with duplicate (key, time) must be pre-deduplicated by the
  * caller for deterministic results (same contract as DuckDB ASOF JOIN).
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side — unique per (key, time)
    * @param leftKey    join key column name on left
    * @param rightKey   join key column name on right
    * @param leftTime   event-time column name on left
    * @param rightTime  event-time column name on right
    * @param rightCols  right columns to carry (payload); emitted with prefix
    * @return left rows + matched right payload columns (null if no match)
    */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0)) // right sorts first at equal time → "<="
      .withColumn("_payload", struct(rightCols.map(col): _*))
      .select(lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_k"), col("_t"), col("_side"), col("_payload")): _*)
    val unioned = l.select((lCols.map(col) ++
      Seq(col("_k"), col("_t"), col("_side"), col("_payload"))): _*)
      .unionByName(r)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    rightCols.foldLeft(matched) { (acc, c) =>
      acc.withColumn(s"asof_$c", col(s"_asof.$c"))
    }.drop("_k", "_t", "_side", "_payload", "_asof")
  }
}
