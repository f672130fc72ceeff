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
      benchmarkPred: Column, n: Int = 8, maxGrams: Long = 1L << 24): Array[Byte] =
    graft.functions.MembershipFunctions.encodeLongSet(
      collectGramHashes(df, idCol, textCol, benchmarkPred, n, maxGrams,
        "8 bytes per gram"))

  /** The benchmark split's distinct gram xxhash64es, collected bounded.
    * ONE job: collect limited at maxGrams+1 so an oversized benchmark is
    * loud (the require below) without a separate count() pass re-shingling
    * the whole eval split.
    */
  private def collectGramHashes(df: DataFrame, idCol: String, textCol: String,
      benchmarkPred: Column, n: Int, maxGrams: Long, costNote: String): Array[Long] = {
    val pred = coalesce(benchmarkPred, lit(false))
    val hashes = grams(df.filter(pred), idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("h")).distinct()
    val collected = hashes.limit(
      math.min(maxGrams + 1, Int.MaxValue.toLong).toInt).collect()
    require(collected.length <= maxGrams,
      s"benchmark gram set exceeds $maxGrams distinct grams: " +
        "this side must stay eval-suite-sized; raise maxGrams only with " +
        s"driver/task memory to hold $costNote")
    collected.map(_.getLong(0))
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
    // the probe is per-row heavy (re-shingle + binary search per gram) and
    // fuses into the scan stage — spread a near-singleton split count first
    // (no-op on streams and many-file tables; see TextOps.spreadCompute)
    TextOps.spreadCompute(df)
      .filter(!coalesce(benchmarkPred, lit(false)))
      .filter(!MembershipFunctions.any_gram_in_set(
        gramSet, TextOps.tokens(col(textCol)), n))
  }

  // --------------------------------------------- bloom-pre-screened variant --

  /** Bloom over the benchmark split's distinct gram hashes, ~`bitsPerKey`
    * bits per gram. This is the bounded-memory path for when the exact
    * 64-bit set of [[benchmarkGramSet]] outgrows the broadcast budget (a
    * union of many eval suites): at 10 bits/key the filter is 6× smaller
    * than the exact set and still has NO false negatives, so composing it
    * with an exact verify join ([[decontaminateBloomVerified]]) keeps the
    * result identical to [[decontaminate]]. `maxGrams` defaults higher than
    * the exact set's precisely because smaller-per-key is the point.
    */
  def benchmarkGramBloom(df: DataFrame, idCol: String, textCol: String,
      benchmarkPred: Column, n: Int = 8, bitsPerKey: Int = 10,
      maxGrams: Long = 1L << 27): Array[Byte] =
    graft.functions.MembershipFunctions.encodeBloom(
      collectGramHashes(df, idCol, textCol, benchmarkPred, n, maxGrams,
        s"$bitsPerKey bits per gram"), bitsPerKey)

  /** Exact decontamination with a bloom pre-screen: corpus docs whose grams
    * all MISS the bloom are provably clean (no false negatives) and never
    * touch a join; the suspicious remainder — true hits plus the ~fpp
    * sliver of bloom false positives — is verified EXACTLY against the
    * benchmark gram table. Result-identical to [[decontaminate]] (the d24
    * oracle and the OpsSpec equivalence test assert it).
    *
    * Scale shape: the probe is the same stateless codegen'd projection as
    * [[decontaminateBySet]] (streams, no shuffle of the clean mass); the
    * verify join re-shingles only `fpp·corpus + contaminated` docs, so the
    * expensive exact machinery runs on a vanishingly small slice.
    */
  def decontaminateBloomVerified(df: DataFrame, bloom: Array[Byte],
      idCol: String, textCol: String, benchmarkPred: Column,
      n: Int = 8): DataFrame = {
    import graft.functions.MembershipFunctions
    val pred = coalesce(benchmarkPred, lit(false))
    // spread the per-row bloom probe off a near-singleton split count
    // (see decontaminateBySet)
    val corpus = TextOps.spreadCompute(df).filter(!pred)
    val suspicious = corpus.filter(MembershipFunctions.any_gram_in_bloom(
      bloom, TextOps.tokens(col(textCol)), n))
    val benchGrams = grams(df.filter(pred), idCol, textCol, n)
      .select(col("shingle")).distinct()
    val confirmed = grams(suspicious, idCol, textCol, n)
      .join(broadcast(benchGrams), "shingle")
      .select(col(idCol)).distinct()
    corpus.join(confirmed, Seq(idCol), "left_anti")
  }
}
