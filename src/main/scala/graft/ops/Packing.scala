package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated corpus and a training run:
  * assign documents to fixed token-budget bins so the data loader can stream
  * bin-sized batches without a global sort.
  *
  * The assignment is the deterministic offset form: within a shard, docs are
  * laid end-to-end in id order and a doc's bin is its START offset divided by
  * the budget (docs may straddle a boundary — the loader's concat-and-chunk
  * semantics, à la GPT-style pretraining packing, not best-fit bin packing,
  * which is order-dependent and unreproducible across partitionings).
  *
  * Scale: packing is inherently sequential, so the corpus is sharded first
  * (`pmod(id, shards)` per language) and each shard packs independently — a
  * window over (lang, shard) whose partitions are corpus/shards-sized. At
  * 100 TB, `shards` scales with the cluster (thousands), keeping every
  * window partition executor-sized; one shuffle total.
  */
object Packing {

  /** (idCol, partition cols..., n_tokens, shard, bin) for every row of `df`.
    *
    * @param budget tokens per bin (e.g. 2048/4096/8192 context lengths)
    * @param shards independent packing lanes per partition-column group
    */
  def assignBins(df: DataFrame, idCol: String, nTokens: Column, budget: Long,
      shards: Int, partitionCols: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window
      .partitionBy(partitionCols :+ col("shard"): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", nTokens)
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      // start offset DIV budget — exact integer arithmetic end to end
      .withColumn("bin", expr(s"(_cum - n_tokens) DIV ${budget}L"))
      .drop("_cum")
  }
}
