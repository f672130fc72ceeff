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

  // ----------------------------------------------- membership-set variant --

  /** The benchmark split's distinct gram xxhash64 set, serialized sorted —
    * the plan-constant behind [[decontaminateBySet]]. The eval side is
    * SMALL by definition (same argument as the broadcast in
    * [[contaminationHits]]), so collecting its distinct hashes is bounded;
    * `maxGrams` makes an oversized benchmark loud instead of a silent
    * driver OOM. 64 bits/gram — the same footprint as a 1e-9-target bloom,
    * but EXACT: Spark's sketch bloom has a measured ~6e-6 false-positive
    * floor that over-dropped one clean demo doc per run (see
    * [[graft.functions.MembershipFunctions]]), while a 64-bit hash set
    * misfires only on a hash collision (~1e-11 at 10⁶×10¹⁰ gram pairs).
    */
  def benchmarkGramSet(df: DataFrame, idCol: String, textCol: String,
      benchmarkPred: Column, n: Int = 8, maxGrams: Long = 1L << 24): Array[Byte] = {
    import graft.functions.MembershipFunctions
    val pred = coalesce(benchmarkPred, lit(false))
    val hashes = grams(df.filter(pred), idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("h")).distinct()
    // ONE job: collect bounded at maxGrams+1 so an oversized benchmark is
    // loud (the require below) without a separate count() pass re-shingling
    // the whole eval split.
    val collected = hashes.limit(
      math.min(maxGrams + 1, Int.MaxValue.toLong).toInt).collect()
    require(collected.length <= maxGrams,
      s"benchmark gram set exceeds $maxGrams distinct grams: " +
        "this side must stay eval-suite-sized; raise maxGrams only with " +
        "driver/task memory to hold 8 bytes per gram")
    MembershipFunctions.encodeLongSet(collected.map(_.getLong(0)))
  }

  /** Contamination filter as a stateless membership probe: keep corpus docs
    * none of whose n-gram hashes are in the benchmark set. No join, no
    * shuffle, no state — the corpus side is a pure filter, which is what
    * makes the same predicate usable on an unbounded STREAM
    * ([[graft.streaming.StreamOps.decontaminateStream]]).
    *
    * The probe is ONE native expression over the token array
    * ([[graft.functions.GramSetContains]]): gram assembly (concat_ws-" "
    * semantics), xxhash64 (seed 42) and sorted-set binary search in a tight
    * early-exit loop. The composed-Column spelling
    * (`exists(shingles(toks), g => long_set_contains(set, xxhash64(g)))`)
    * computes the same thing but HOFs are CodegenFallback AND predicate
    * pushdown inlines the tokenizer `split` into the shingle lambda — one
    * regex re-run per element access, measured 16 s vs sub-second at sf0.1.
    * Gram construction matches [[Dedup.shingleSet]] bit-for-bit, so results
    * equal [[decontaminate]] — the d10 oracle and the OpsSpec equivalence
    * test assert exactly that.
    */
  def decontaminateBySet(df: DataFrame, gramSet: Array[Byte], textCol: String,
      benchmarkPred: Column, n: Int = 8): DataFrame = {
    import graft.functions.MembershipFunctions
    df.filter(!coalesce(benchmarkPred, lit(false)))
      .filter(!MembershipFunctions.any_gram_in_set(
        gramSet, TextOps.tokens(col(textCol)), n))
  }
}
