package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent AND partitioning-dependent — rerunning
  * after a repartition (or on a different cluster size) selects different
  * rows, which breaks dataset reproducibility guarantees. Hash-based
  * Bernoulli sampling keys the decision on the ROW (a stable id), so the
  * same corpus always yields the same sample, on any engine: row selected
  * iff the first 32 bits of md5(key) fall below rate·2³². Pure per-row
  * column expressions — zero shuffle, pushes through scans.
  */
object Sampling {

  private val Two32 = 4294967296.0 // 2^32

  /** Uniform 32-bit bucket from the md5 of `key` rendered as a string —
    * cheap, uniform, and reproducible in any engine with md5 (the oracle
    * recomputes it nibble-by-nibble in SQL).
    */
  def hashBucket32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Threshold such that P[bucket < threshold] = rate, computed identically
    * on the driver for Spark and for generated oracle SQL (no float math in
    * the plan).
    */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    (rate * Two32).toLong
  }

  /** Deterministic Bernoulli sample: keep each row with probability `rate`,
    * keyed on `key`.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hashBucket32(key) < lit(threshold(rate)))

  /** Stratified deterministic sample: per-stratum rates (e.g. per-language
    * down-sampling to rebalance a corpus). Strata absent from `rates` are
    * dropped. The rate map rides along as a literal map expression —
    * effectively a broadcast join without the join.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double]): DataFrame = {
    val thresholds = rates.map { case (k, r) => k -> threshold(r) }
    df.filter(hashBucket32(key) <
      element_at(typedlit(thresholds), stratum.cast("string")))
  }
}
