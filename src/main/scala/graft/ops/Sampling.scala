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

  /** Temperature-weighted domain mixture (the α = 1/T up-/down-sampling of
    * multilingual pretraining, Conneau & Lample 2019 / XLM-R): domain s with
    * nₛ rows gets a target share ∝ nₛ^0.5, i.e. rate per row
    * min(1, T·wₛ / (Σw · nₛ)) for a total budget of ~T rows — small domains
    * are boosted relative to their share, huge ones suppressed. Rows are then
    * kept by the same deterministic [[hashSample]] bucket rule, keyed on the
    * row id, so the mixture is reproducible on any engine or partitioning.
    *
    * Every number on the way to the per-domain bucket threshold is exact:
    * wₛ = ⌊√nₛ · 2²⁰⌋ (IEEE sqrt is correctly rounded — bit-identical in any
    * engine), Σw is an integer sum, and the rate is ONE double division of
    * exact integers followed by one multiply and a floor — no float-sum
    * ordering anywhere (the [[TextOps.qualityScore]] lesson: a chain of
    * float ops diverges from an oracle by an ulp; a single division never
    * does).
    *
    * Scale shape: one tiny groupBy(domain) for the counts (partial-agg), a
    * windowed integer sum over the #domains-row table, a broadcast join of
    * the thresholds, and a map-side filter — the corpus itself is never
    * shuffled and never windowed.
    */
  def temperatureSample(df: DataFrame, key: Column, domain: Column,
      totalTarget: Long): DataFrame = {
    require(totalTarget > 0, s"totalTarget must be positive: $totalTarget")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val thresholds = df.groupBy(domain.as("_dom"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_w",
        floor(sqrt(col("_n").cast("double")) * lit(1048576.0)).cast("long"))
      .withColumn("_ws", sum(col("_w")).over(wAll))
      // products in double (exact-long multiply can overflow at corpus
      // scale); each step is one deterministic IEEE op, same spelling as
      // the oracle SQL — no ordering-dependent accumulation anywhere
      .withColumn("_thr", floor(least(lit(1.0),
        lit(totalTarget.toDouble) * col("_w").cast("double") /
          (col("_ws").cast("double") * col("_n").cast("double"))) *
        lit(Two32)).cast("long"))
      .select(col("_dom"), col("_thr"))
    df.withColumn("_dom", domain)
      .join(broadcast(thresholds), "_dom")
      .filter(hashBucket32(key) < col("_thr"))
      .drop("_dom", "_thr")
  }
}
