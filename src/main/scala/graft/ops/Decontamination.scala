package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data pipeline stage that removes
  * corpus documents overlapping an evaluation set, by long word-n-gram
  * collision (the standard n-gram screen described in public LLM training
  * reports, e.g. GPT-3 §C / PaLM / Llama dataset cards: a document is
  * contaminated when it shares at least one n-gram with the benchmark).
  *
  * Scale shape (100 TB discipline): the benchmark side is SMALL by
  * definition (eval sets are thousands of docs, the corpus is billions), so
  * its distinct n-gram set is broadcast — the corpus side streams through a
  * broadcast-hash semi-join keyed on the n-gram with NO shuffle of corpus
  * data at all; output is per-doc hit counts, aggregated map-side.
  */
object Decontamination {

  /** Distinct word n-grams of `textCol` per document, via
    * [[Dedup.shingleSet]] (tokens materialized before the HOF — the lambda
    * capture rule, see SPARK pitfalls note).
    */
  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int) =
    Dedup.shingleSet(df, idCol, textCol, n)

  /** Per-document contamination hits: corpus docs (those NOT matching
    * `benchmarkPred`) that share ≥1 word-`n`-gram with any benchmark doc
    * (those matching it). Returns (idCol, n_hits) with n_hits = number of
    * DISTINCT shared n-grams, only for contaminated docs.
    *
    * @param benchmarkPred picks the benchmark/eval rows out of `df`
    * @param n             n-gram length; long enough that chance collisions
    *                      are negligible (8+ for natural text)
    */
  def contaminationHits(df: DataFrame, idCol: String, textCol: String,
      benchmarkPred: Column, n: Int = 8): DataFrame = {
    // NULL-pred rows (e.g. a null key column) count as corpus, not benchmark:
    // filter(p)/filter(!p) would silently drop them from BOTH sides.
    val pred = coalesce(benchmarkPred, lit(false))
    val benchGrams = grams(df.filter(pred), idCol, textCol, n)
      .select(col("shingle")).distinct()
    val corpusGrams = grams(df.filter(!pred), idCol, textCol, n)
    corpusGrams
      .join(broadcast(benchGrams), "shingle")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits")) // grams are distinct per doc already
  }

  /** The removal filter a pipeline composes: `df` minus contaminated docs. */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
      benchmarkPred: Column, n: Int = 8): DataFrame =
    df.filter(!coalesce(benchmarkPred, lit(false)))
      .join(contaminationHits(df, idCol, textCol, benchmarkPred, n)
        .select(col(idCol)), Seq(idCol), "left_anti")
}
