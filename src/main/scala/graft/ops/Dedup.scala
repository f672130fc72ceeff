package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (100 TB discipline):
  *  - exact dedup = hash-groupBy (one shuffle, map-side combine);
  *  - MinHash signatures = one explode + one groupBy with k partial-min
  *    aggregates (map-side combined), NOT k passes;
  *  - LSH banding turns O(n²) pair generation into equality joins on
  *    (band, bandHash) — shuffle-partitioned by bucket, skew-safe because
  *    bucket population is bounded by signature collisions;
  *  - candidate verification joins only the candidate pairs back to the
  *    shingle sets (candidates ≪ n²).
  */
object Dedup {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Repeated-substring span statistics — the token-window form of exact
    * substring dedup (Lee et al. 2021, arXiv:2107.06499: dedup TRAINING
    * SPANS, not whole documents; their suffix array finds char-level repeats,
    * this finds token-window repeats, the Spark-native granularity). A
    * window of `k` consecutive tokens is "duplicated" when its exact text
    * occurs more than once in the corpus (anywhere — other docs or the same
    * doc); per doc the duplicated windows are unioned into maximal SPANS and
    * reported as exact counts, ready for a span-removal or doc-drop policy.
    *
    * Returns one row per input doc: (idCol, n_tokens, dup_windows, n_spans,
    * covered_tokens, covered_ppm) — covered_ppm = ⌊covered·10⁶/n_tokens⌋,
    * exact integer.
    *
    * Scale shape: ONE groupBy on window text (partial-agg, map-side
    * combined) + one join back (both shuffle on the window key — at corpus
    * scale swap the string key for xxhash64(g), kept textual here so the
    * DuckDB oracle replays byte-for-byte); the interval union is
    * gaps-and-islands over DUPLICATED windows only (running max(end), one
    * window-function pass over a stream that is usually a small fraction of
    * the corpus) — never a per-token explode, never interval arrays on the
    * driver.
    */
  def repeatedSpanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, groupOnHash: Boolean = false,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val (toks, spans) = repeatedWindowSpans(df, idCol, textCol, k,
      groupOnHash, scope)
    val perDoc = spans
      .groupBy(idCol)
      .agg(sum(col("e2") - col("s")).as("covered_tokens"),
        count(lit(1)).as("n_spans"), sum(col("wc")).as("dup_windows"))
    toks.select(col(idCol), col("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("covered_ppm",
        expr("(covered_tokens * 1000000) div greatest(n_tokens, 1)"))
  }

  /** Span REMOVAL — the actual dedup step of Lee et al. (their "ExactSubstr"
    * cut, at token-window granularity): subtract every maximal duplicated
    * span from every document and emit the residual text. Conservative
    * drop-all policy — every occurrence of a duplicated window is cut (the
    * keep-one-occurrence policy is a per-window global argmin and composes
    * from the same spans; drop-all is the standard conservative cleaning
    * choice and keeps the operator a pure two-shuffle shape).
    *
    * Output: (idCol, n_tokens, text_clean, removed_tokens), whitespace-
    * normalized (residual tokens rejoined with single spaces).
    *
    * Scale shape: the spans core (one groupBy + one join-back, see
    * [[repeatedSpanStats]]) plus a per-doc `collect_list` of spans — bounded
    * by n_tokens/1 per doc, never corpus-wide — and a higher-order
    * `filter(toks, (t, i) => !exists(spans, …))` projection; no per-token
    * explode, nothing on the driver. Pass `groupOnHash = true` at scale.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, groupOnHash: Boolean = false,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val (toks, spans) = repeatedWindowSpans(df, idCol, textCol, k,
      groupOnHash, scope)
    val perDoc = spans.groupBy(idCol)
      .agg(collect_list(struct(col("s"), col("e2").as("e"))).as("_spans"))
    toks.join(perDoc, Seq(idCol), "left")
      .withColumn("_spans", coalesce(col("_spans"),
        array().cast("array<struct<s:bigint,e:bigint>>")))
      .select(col(idCol), col("n_tokens"),
        concat_ws(" ", filter(col("_toks"), (t, i) =>
          !exists(col("_spans"), sp =>
            i.cast("long") >= sp("s") && i.cast("long") < sp("e"))))
          .as("text_clean"),
        aggregate(col("_spans"), lit(0L),
          (acc, sp) => acc + (sp("e") - sp("s"))).as("removed_tokens"))
  }

  /** Shared core of d20/d21/d22: tokenized docs plus the per-doc maximal
    * duplicated spans (island id, start, end, window count).
    *
    * `groupOnHash` is the 100 TB path (VERDICT r7 #3): the repeated-window
    * groupBy/join keys on `xxhash64(gram)` (8 B/window) instead of the raw
    * k-token text (~50 B/window ≈ 50× the corpus bytes through the
    * shuffle). A 64-bit collision falsely marks one window duplicated with
    * probability ~n²/2⁶⁴ — at 10¹⁰ windows that is ~windows·n/2⁶⁴ ≈ 5
    * false windows corpus-wide, noise against boilerplate-scale dup mass;
    * the textual form stays the oracle twin.
    */
  private def repeatedWindowSpans(df: DataFrame, idCol: String,
      textCol: String, k: Int, groupOnHash: Boolean,
      scope: CacheScope): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"window must span >= 2 tokens: $k")
    val toks = TextOps.spreadCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
    val wins0 = toks
      .select(col(idCol), posexplode(TextOps.shingles(col("_toks"), k))
        .as(Seq("pos", "g")))
    val wins = scope.cached(
      if (groupOnHash) wins0.withColumn("g", xxhash64(col("g"))) else wins0)
    val repeated = wins.groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("g")
    val dup = wins.join(repeated, "g")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        (col("pos") + k).cast("long").as("e"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val prevMaxEnd = max(col("e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val spans = dup
      .withColumn("ni",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), max(col("e")).as("e2"),
        count(lit(1)).as("wc"))
    (toks, spans)
  }

  /** Default document-frequency cap for candidate-generation joins. A shingle
    * (or band bucket) shared by m docs emits m² join rows — boilerplate text
    * ("terms and conditions apply") in a web-scale corpus is a single-reducer
    * death. Shingles above the cap carry ~zero Jaccard information (they
    * discriminate nothing), so dropping them is the standard fix. 1000 keeps
    * the worst key at ≤10⁶ join rows per shingle while never triggering on
    * corpora without pathological boilerplate (measured max df: 7 at sf0.01,
    * 25 at sf0.1).
    */
  final val DefaultMaxDocFreq = 1000L

  /** Pin a to-be-cached table's partition layout on `key` at the session's
    * shuffle width — but ONLY when the session's AQE coalescing is
    * byte-driven (`coalescePartitions.parallelismFirst=false`).
    *
    * The hazard (r12, measured at 100×): AQE sizes a cached table's
    * partitioning from its shuffle's COMPRESSED bytes, so a session tuned
    * for compute-dense stages (8–16 MB advisory, parallelismFirst=false)
    * coalesced the shingle cache into a handful of partitions that
    * deserialize to 70–110 MB — and every cache-reading stage inherited the
    * fat layout as 7–10 s stragglers. An explicit numPartitions repartition
    * is exempt from AQE coalescing, and partitioning by the groupBy key
    * makes the signature/size consumers exchange-free on the cached layout.
    *
    * The pin is CONDITIONAL because it is not free: under the default
    * parallelism-first policy AQE already guards the layout (it coalesces
    * toward defaultParallelism, never byte-fat partitions), and pinning
    * unconditionally forces small corpora onto width-32 stages whose
    * per-task fixed costs dominate — measured on the sf0.1 sweep as
    * +40–50 % wall on d03/d13/d06 (task-seconds 22→147 on d03: kilobyte
    * partitions paying 32-task scheduling through every cache consumer).
    * Byte-driven coalescing is exactly the condition under which AQE stops
    * guarding parallelism, so it is exactly when the operator must.
    *
    * `force` is the *Auto forms' corpus-size override (they know n from
    * their operating-point count): at [[PinLayoutMinDocs]]+ docs the
    * shingle cache is 100+ MB deserialized even at default sessions, and
    * aligning it on the groupBy key saves the signature/size exchanges —
    * measured at 100× (500 k docs, default session) as 26.2→21.9 s on
    * d03's auto form.
    */
  private def pinCacheLayout(df: DataFrame, key: Column,
      force: Boolean = false): DataFrame = {
    val ss = df.sparkSession
    val byteDriven = !ss.conf.get(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true").toBoolean
    if (force || byteDriven)
      df.repartition(ss.sessionState.conf.numShufflePartitions, key)
    else df
  }

  /** Corpus size above which the *Auto forms pin their shingle-cache layout
    * even at default sessions (see [[pinCacheLayout]]): ~100 k docs ≈ 10 M
    * hashed shingles ≈ 160 MB+ deserialized — the fat-partition regime.
    * Below it, per-task fixed costs dominate and AQE's byte-sized choice
    * is the better layout.
    */
  final val PinLayoutMinDocs = 100000L

  /** Drop shingle hashes whose document frequency exceeds `maxDf`. The hot
    * set is tiny by construction (≤ total_occurrences / maxDf keys), so it
    * broadcasts; the anti-join is map-side — no extra shuffle of the big
    * shingle table. Note the corner case: a doc ALL of whose shingles are
    * above the cap drops out of candidate generation entirely — callers that
    * need exact Jaccard semantics on such corpora must pass
    * `maxDocFreq = Long.MaxValue`.
    */
  private def capDocFreq(hashed: DataFrame, maxDf: Long): DataFrame =
    if (maxDf == Long.MaxValue) hashed
    else {
      val hot = hashed.groupBy(col("sh")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > maxDf).select("sh")
      hashed.join(broadcast(hot), Seq("sh"), "left_anti")
    }

  /** Exact dedup: survivor = min id per identical key column.
    * NOTE (r16): spreading the scan (TextOps.spreadCompute) was measured
    * slightly WORSE here — the fingerprint projection is too light for the
    * extra exchange at the gated scale, and a real corpus has many splits.
    */
  def exactSurvivors(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("dedup_key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Incremental exact dedup — the daily-ingest form every growing corpus
    * runs: survivors among `incoming` are docs that are (a) first (min id)
    * within their own batch's key group and (b) absent from the
    * already-accepted `history`. History contributes only its distinct keys
    * (narrow rows); the anti-join shuffles both sides on the key — at
    * corpus scale, bucket the history table by the dedup key so daily runs
    * co-locate against it with no history re-shuffle. Returns
    * (dedup_key, idCol, n_dups) like [[exactSurvivors]], where n_dups
    * counts within-batch copies (history hits simply drop the group).
    */
  def incrementalExactSurvivors(history: DataFrame, incoming: DataFrame,
      idCol: String, keyCol: Column): DataFrame = {
    val histKeys = history.select(keyCol.as("dedup_key")).distinct()
    incoming.groupBy(keyCol.as("dedup_key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .join(histKeys, Seq("dedup_key"), "left_anti")
  }

  /** (id, shingle) pairs — distinct per doc.
    *
    * Tokens are materialized in their own projection BEFORE the shingle
    * lambda: a lambda that captures the raw `split(...)` expression re-runs
    * the regex split on every element access (no CSE inside higher-order
    * functions) — the difference between O(tokens) and O(tokens²) splits.
    *
    * Dedup happens per doc with `array_distinct` BEFORE the explode — the
    * same row set a global `.distinct()` would produce (rows are
    * (id, shingle), so global row-dedup IS per-doc dedup), but map-side
    * with zero shuffle instead of exchanging the entire exploded gram
    * stream. At corpus scale that removed shuffle is the largest exchange
    * in the Jaccard/decontamination plans.
    */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    // spread before tokenizing: the shingle chain fuses into the scan stage,
    // so a near-singleton split count serializes it (TextOps.spreadCompute)
    TextOps.spreadCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        explode(array_distinct(TextOps.shingles(col("_toks"), n))).as("shingle"))

  /** Shared inverted-index overlap table: (d1, d2, inter, n1, n2) for every
    * doc pair sharing ≥1 shingle (no O(n²) scan — only docs that collide on
    * a shingle hash ever meet). Sizes and intersections are both computed
    * over the df-capped shingle space so derived metrics stay consistent.
    *
    * Joins/shuffles ride the 64-bit shingle hash instead of the string: same
    * intersection counts up to a ~n²/2⁶⁵ collision probability (~1e-9 for
    * 10⁵ distinct shingles), at a fraction of the shuffle bytes. The hashed
    * table is cached: consumed by sizes + both join sides (3 full recomputes
    * otherwise — at cluster scale this is the materialized shingle table);
    * lifetime is the caller's CacheScope.
    */
  private def overlapPairs(shingles: DataFrame, idCol: String, maxDf: Long,
      scope: CacheScope): DataFrame = {
    // NOTE (r16): caching BEFORE the df cap was tried and reverted — it
    // moves the hot-set build onto the cache, but the anti-join + hot
    // aggregate then replicate into EVERY consumer subtree (d03 measured
    // 3× slower, 32 InMemoryTableScans). The post-cap cache pays the hot
    // build one extra pass of the shingle chain, which spreadCompute has
    // made parallel — the cheaper trade.
    val hashed = scope.cached(capDocFreq(
      shingles.select(col(idCol), xxhash64(col("shingle")).as("sh")),
      maxDf))
    val sizes = hashed.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = hashed.select(col(idCol).as("d1"), col("sh"))
    val b = hashed.select(col(idCol).as("d2"), col("sh"))
    a.join(b, Seq("sh")).filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("d1"), col("sz").as("n1")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("sz").as("n2")), "d2")
  }

  /** Exact pairwise Jaccard over an inverted shingle index. Returns (d1, d2,
    * inter, n1, n2, jaccard) for pairs with jaccard ≥ threshold. Jaccard is
    * computed over the df-capped shingle space (shingles in > `maxDocFreq`
    * docs are ignored everywhere — sizes and intersections stay consistent).
    */
  def jaccardPairs(shingles: DataFrame, idCol: String, threshold: Double,
      maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    overlapPairs(shingles, idCol, maxDocFreq, scope)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)

  /** Asymmetric containment: |A∩B| / min(|A|,|B|) — catches a short doc
    * embedded in a long one, where Jaccard stays low because the union is
    * dominated by the long doc (the dedup literature's standard second
    * metric next to Jaccard for exactly that blind spot). Same inverted
    * index and df cap as [[jaccardPairs]]; returns (d1, d2, inter, n1, n2,
    * containment) at ≥ threshold. The single exact-integer division keeps
    * the score bit-identical across engines.
    */
  def containmentPairs(shingles: DataFrame, idCol: String, threshold: Double,
      maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    overlapPairs(shingles, idCol, maxDocFreq, scope)
      .withColumn("containment",
        col("inter").cast("double") /
          least(col("n1"), col("n2")).cast("double"))
      .filter(col("containment") >= threshold)

  /** Source-priority exact dedup — cross-source corpora keep the COPY FROM
    * THE BEST SOURCE, not the lowest id (curated dump beats CommonCrawl for
    * the same page — the RefinedWeb/Dolma convention). Survivor per
    * identical key = arg-min (priority, id); same single-shuffle
    * partial-agg shape as [[exactSurvivors]] (min(struct) combines
    * map-side — no window, no second pass). Returns
    * (idCol, priority, n_dups) per surviving row.
    */
  def prioritySurvivors(df: DataFrame, idCol: String, keyCol: Column,
      priority: Column): DataFrame =
    df.groupBy(keyCol.as("dedup_key"))
      .agg(min(struct(priority.as("priority"), col(idCol).as(idCol))).as("m"),
        count(lit(1)).as("n_dups"))
      .select(col("m." + idCol).as(idCol), col("m.priority").as("priority"),
        col("n_dups"))

  /** Edit-distance-verified near-dup pairs — the fuzzy-dedup second stage
    * (à la NeMo Curator / Gyawali et al.): shingle-overlap candidate
    * generation (same inverted index + df cap as [[jaccardPairs]]) followed
    * by an exact Levenshtein verify on the candidate pairs only. Character
    * edit distance catches in-place typo/small-patch duplicates that
    * set-semantics Jaccard scores low when the edit lands in many shingles.
    *
    * Returns (d1, d2, inter, edit_dist) for candidates sharing ≥ `minInter`
    * shingles AND ≥ `minOverlapPct`% of the smaller doc's shingles, with
    * edit_dist ≤ `maxDist`. Scale shape: candidates are a narrow id-pair
    * list ≪ n²; the two text joins ride the id keys; Levenshtein runs once
    * per CANDIDATE, never per corpus pair — and it is the BANDED 3-arg
    * form, O(len·maxDist) with early exit instead of the O(len²) full DP.
    * The containment pregate is what makes the verify set tight: an edit-
    * distance near-dup shares most of the smaller doc's shingles (each char
    * edit breaks ≤ n shingles), while incidental-overlap pairs sit at
    * inter ≪ min(n1,n2) — on the sf0.1 corpus the 25% default cuts the
    * candidate set 267× (112k → 419 pairs), the difference between the
    * verify being free and being the slowest stage in the plan.
    */
  /** Width for the Levenshtein verify exchange, sized from the CANDIDATE
    * COUNT instead of the session shuffle width (VERDICT r16 #5 — the
    * session width is a CPU-count constant: at 100 TB a multi-million-pair
    * candidate stream on width 32 puts ~n/32 O(len·maxDist) verifies in
    * one task, an unbounded straggler). ~candsPerTask banded-Levenshtein
    * rows per task keeps tasks in the O(100 ms) range so no task runs
    * >2× the median on candidate-count grounds; the cap (8× session width)
    * bounds tiny-task scheduling overhead the other way. Both knobs
    * conf-overridable (`spark.graft.dedup.verifyCandsPerTask`).
    */
  private[graft] def verifyWidth(ss: org.apache.spark.sql.SparkSession,
      nCands: Long): Int = {
    val perTask = ss.conf.getOption("spark.graft.dedup.verifyCandsPerTask")
      .map(_.toLong).filter(_ > 0).getOrElse(64L)
    val cap = 8L * ss.sessionState.conf.numShufflePartitions
    math.max(1L, math.min((nCands + perTask - 1) / perTask, cap)).toInt
  }

  def editNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int, minInter: Long = 2, minOverlapPct: Int = 25,
      maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged,
      sizeVerifyFromCandidates: Boolean = false): DataFrame = {
    // sizeVerifyFromCandidates trades one extra action (cache + count of
    // the candidate set) for a verify width derived from the MEASURED
    // candidate count — the auto/corpus-scale forms take it (the count is
    // noise against a 100 TB candidate pipeline and the width then rides
    // candidate volume); the fixed registry forms keep the fused
    // single-action plan, which the r17 sweep measured distinctly faster
    // at bench SFs (d17 cold in-sweep 3.35 s counted vs 2.55 s fused,
    // normalized — the split action + cache materialization cost more
    // than the width tuning saved).
    val cands0 = overlapPairs(shingleSet(docs, idCol, textCol),
        idCol, maxDocFreq, scope)
      .filter(col("inter") >= minInter &&
        col("inter") * 100 >= lit(minOverlapPct.toLong) *
          least(col("n1"), col("n2")))
      .select("d1", "d2", "inter")
    val cands =
      if (sizeVerifyFromCandidates) scope.cached(cands0) else cands0
    val width =
      if (sizeVerifyFromCandidates) verifyWidth(docs.sparkSession, cands.count())
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    val t = docs.select(col(idCol), col(textCol))
    cands
      .join(t.select(col(idCol).as("d1"), col(textCol).as("_t1")), "d1")
      .join(t.select(col(idCol).as("d2"), col(textCol).as("_t2")), "d2")
      // explicit round-robin exchange before the verify: the candidate
      // stream is BYTE-small but COMPUTE-heavy (O(len·maxDist) per row), so
      // AQE's byte-based coalescing merges the (d1,d2) aggregate's reduce
      // side into ~one partition and every Levenshtein serializes on a
      // single core — the 10× rehearsal measured a 15.5 s single task.
      // Round-robin specifically: a hash repartition on (d1, d2) is elided
      // by EnsureRequirements (the stream is already hash-partitioned on
      // those keys by the candidate aggregate), which re-creates the
      // coalesced stage; RoundRobinPartitioning never satisfies an
      // existing distribution and a user REPARTITION_BY_NUM is exempt from
      // AQE coalescing. The extra shuffle moves only the candidate texts;
      // round-robin keeps per-task candidate COUNTS uniform at any width.
      .repartition(width)
      // banded Levenshtein: -1 when the distance exceeds maxDist
      .withColumn("edit_dist",
        levenshtein(col("_t1"), col("_t2"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select("d1", "d2", "inter", "edit_dist")
  }

  /** LSH-bounded fuzzy-dedup verify — the 100 TB form of
    * [[editNearDupPairs]] (the NeMo-Curator fuzzy-dedup shape: MinHash-LSH
    * candidates → exact verify): candidates come from [[minhashLshPairs]]'s
    * banding (cost bounded by band-bucket collisions), never from the full
    * inverted-index self-join, whose Σm² blowup is quadratic in near-dup
    * CLUSTER SIZE — on a dup-dense corpus (the 10× rehearsal plants
    * 5-member clusters on every doc) the exact form measured 20-40 s where
    * this one rides the d03 cost envelope. Completeness: a pair at
    * Jaccard ≥ threshold is recalled by ≥1 of 16 bands with
    * P(miss) < 1e-7 (k=64); an edit-dist ≤ maxDist pair on non-tiny docs
    * is far above the Jaccard threshold (each char edit breaks ≤ shingle-n
    * shingles), so the candidate bound loses nothing the verify would keep.
    * Returns (d1, d2, edit_dist).
    *
    * ORACLE/REGISTRY form: fixed (k, bands) is the oracle contract;
    * production callers at corpus scale use [[editNearDupPairsLshAuto]].
    */
  def editNearDupPairsLsh(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int, threshold: Double = 0.8, k: Int = 64, bands: Int = 16,
      maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged,
      pinLayout: Boolean = false): DataFrame = {
    val cands = scope.cached(
      minhashLshPairs(docs, idCol, textCol, threshold, k, bands,
        maxDocFreq, scope, pinLayout)
      .select("d1", "d2"))
    val nCands = cands.count()
    val t = docs.select(col(idCol), col(textCol))
    cands
      .join(t.select(col(idCol).as("d1"), col(textCol).as("_t1")), "d1")
      .join(t.select(col(idCol).as("d2"), col(textCol).as("_t2")), "d2")
      // same round-robin + candidate-count width discipline as
      // editNearDupPairs (see there)
      .repartition(verifyWidth(docs.sparkSession, nCands))
      .withColumn("edit_dist",
        levenshtein(col("_t1"), col("_t2"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select("d1", "d2", "edit_dist")
  }

  /** MinHash signatures: ONE xxhash64 over the shingle string, then k cheap
    * 64-bit finalizer mixes (xor-fold + odd multiply) — hashing the string k
    * times costs k× the string bytes; mixing the long costs 3 ALU ops. One
    * groupBy; each min is a partial aggregate (map-side combined).
    */
  def minhashSignatures(shingles: DataFrame, idCol: String, k: Int = 64): DataFrame =
    // hash the string ONCE in a projection; aggregate inputs are not
    // common-subexpression-eliminated across aggregate functions, so the 64
    // min() inputs must read the precomputed long.
    minhashSignaturesHashed(
      shingles.select(col(idCol), xxhash64(col("shingle")).as("sh")), idCol, k)

  /** As [[minhashSignatures]] but over pre-hashed (id, sh: long) shingles. */
  def minhashSignaturesHashed(hashed: DataFrame, idCol: String, k: Int): DataFrame = {
    val aggs = (0 until k).map(i => min(graft.functions.VectorFunctions.mix64(
      col("sh"), 0x9e3779b97f4a7c15L * (i + 1))).as(s"mh$i"))
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** (id, band, bh) LSH band-bucket table for signature rows, with buckets
    * wider than `maxBucket` dropped: a band bucket holding m docs emits m²
    * join rows, and at corpus scale one boilerplate bucket is a
    * single-reducer hot spot. Near-dups at the target threshold collide in
    * many bands (j≥0.8 → E[collisions] ≈ 16·0.8⁴ ≈ 6.5 of 16), so losing
    * one oversized bucket costs ~zero recall.
    */
  def bandBuckets(sigs: DataFrame, idCol: String, k: Int, bands: Int,
      maxBucket: Long): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands ($bands) must divide k ($k)")
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * r until (b + 1) * r).map(i => col(s"mh$i")): _*).as("bh"))
    }
    val buckets = sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("e"))
      .select(col(idCol), col("e.band"), col("e.bh"))
    if (maxBucket == Long.MaxValue) buckets
    else {
      val hot = buckets.groupBy(col("band"), col("bh"))
        .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucket)
        .select("band", "bh")
      buckets.join(broadcast(hot), Seq("band", "bh"), "left_anti")
    }
  }

  /** LSH banding: k sigs → `bands` buckets of r = k/bands rows; two docs
    * collide if any band hashes equal. Returns candidate pairs (d1 < d2)
    * from the self-join of [[bandBuckets]].
    */
  def lshCandidates(sigs: DataFrame, idCol: String, k: Int = 64, bands: Int = 16,
      maxBucket: Long = DefaultMaxDocFreq): DataFrame = {
    val capped = bandBuckets(sigs, idCol, k, bands, maxBucket)
    capped.as("x").join(capped.as("y"), Seq("band", "bh"))
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("d1"), col(s"y.$idCol").as("d2"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate →
    * verify with exact Jaccard. Output identical to brute-force
    * [[jaccardPairs]] whenever LSH recall holds at the threshold
    * (P(miss | j≥0.9) < 1e-7 at k=64, bands=16).
    *
    * ORACLE/REGISTRY form (VERDICT r11 #6): the fixed (k, bands) point IS
    * the DuckDB-oracle contract and stays the registry query. Production
    * callers at corpus scale should use [[minhashLshPairsAuto]], which
    * sizes (k, bands) jointly from (n, threshold) with a logged miss bound
    * — the fixed point's recall/candidate-mass balance only holds near the
    * demo corpus size.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 64, bands: Int = 16,
      maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged,
      pinLayout: Boolean = false): DataFrame = {
    // cached: signatures, sizes and both verification join sides all read
    // the hashed shingle set (4 scan+explode+distinct recomputes otherwise);
    // lifetime is the caller's CacheScope. The df cap applies to the whole
    // pipeline (signatures, sizes, intersections) so verified Jaccard stays
    // consistent with [[jaccardPairs]] at the same cap.
    //
    // Cache layout conditionally pinned by idCol — see [[pinCacheLayout]].
    val hashed = scope.cached(pinCacheLayout(capDocFreq(
      shingleSet(df, idCol, textCol)
        .select(col(idCol), xxhash64(col("shingle")).as("sh")),
      maxDocFreq), col(idCol), force = pinLayout))
    // NOTE (r16): an eager hashed.count() to pre-build the cache before its
    // four concurrent consumer stages was measured a wash (the extra job
    // costs what the block-lock contention saves) — left lazy.
    val cands = lshCandidates(minhashSignaturesHashed(hashed, idCol, k), idCol, k, bands,
      maxBucket = maxDocFreq)
    val sizes = hashed.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val e1 = hashed.select(col(idCol).as("d1"), col("sh"))
    val e2 = hashed.select(col(idCol).as("d2"), col("sh"))
    val inter = cands.join(e1, "d1").join(e2, Seq("d2", "sh"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("d1"), col("sz").as("n1")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("sz").as("n2")), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
  }

  /** Joint (k, bands) operating point for MinHash-LSH near-dup at corpus
    * size `n` — [[graft.ops.Similarity.lshOperatingPoint]]'s discipline
    * applied to the MinHash family (VERDICT r10 #4: the fixed k=64/16-band
    * production point relies on the bucket cap silently discarding mass as
    * n grows; s07's fixed point ENOSPC'd the same way before its auto
    * point):
    *  - band width r scales with log n so that BACKGROUND pairs (Jaccard ≈
    *    `jBackground`, a conservatively adversarial bound — unrelated web
    *    docs sit near 0, boilerplate-ish corpora higher) contribute only
    *    O(n) candidates across all bands:
    *    bands·C(n,2)·jBg^r ≤ 32·n  →  r ≥ ln(bands·n/64)/ln(1/jBg);
    *  - bands then come from the miss bound for a pair at exactly
    *    `threshold`: (1 − θ^r)^bands ≤ missTarget.
    * k = r·bands minhashes per doc. If k exceeds `maxK`, bands back off to
    * maxK/r and the DEGRADED miss bound is logged loudly — a weak threshold
    * at scale is intrinsically expensive and the point never hides that.
    * At the demo corpora (n ≤ ~500 k) this resolves to r=4, bands≈14 —
    * within noise of the historical fixed 64/16 point — and grows to
    * r=6/23 at 10⁸ docs, r=9/48 at 10¹¹ (the 100 TB decade).
    */
  def minhashOperatingPoint(n: Long, threshold: Double,
      missTarget: Double = 1e-3, maxK: Int = 512,
      jBackground: Double = 0.05): (Int, Int) = {
    require(n > 0 && threshold > 0 && threshold < 1,
      s"minhashOperatingPoint: need n > 0 and threshold in (0,1), got n=$n t=$threshold")
    require(missTarget > 0 && missTarget < 1 && maxK >= 4)
    require(jBackground > 0 && jBackground < threshold,
      "background Jaccard must sit below the near-dup threshold")
    def bandsFor(r: Int): Int = math.max(1, math.ceil(math.log(missTarget) /
      math.log1p(-math.pow(threshold, r.toDouble))).toInt)
    def rFor(bands: Int): Int = math.max(2, math.ceil(
      math.log(bands.toDouble * n.toDouble / 64.0) /
        math.log(1.0 / jBackground)).toInt)
    var r = rFor(16)
    var bands = bandsFor(r)
    r = rFor(bands) // one fixed-point refinement (converges immediately:
    bands = bandsFor(r) // r is log-sensitive to bands)
    def missOf(rr: Int, bb: Int): Double =
      math.pow(1.0 - math.pow(threshold, rr.toDouble), bb.toDouble)
    var k = r * bands
    if (k > maxK) {
      bands = math.max(1, maxK / r)
      k = r * bands
      log.warn(f"minhashOperatingPoint: maxK=$maxK caps bands at $bands — " +
        f"miss bound degrades to ${missOf(r, bands)}%.2e (> target " +
        f"$missTarget%.2e): threshold $threshold%.2f at n=$n is " +
        "intrinsically expensive; raise maxK or the threshold")
    }
    log.info(f"minhashOperatingPoint: n=$n threshold=$threshold%.2f -> " +
      f"r=$r bands=$bands k=$k missAtThreshold=${missOf(r, bands)}%.2e " +
      f"bgCandidatesPerDoc=${bands * (n - 1) * math.pow(jBackground, r.toDouble) / 2}%.2f")
    (k, bands)
  }

  /** [[minhashLshPairs]] at the jointly-scaled operating point from
    * [[minhashOperatingPoint]] — the corpus-scale form: one `count()`
    * sizes the corpus, then (k, bands) scale together so neither recall
    * nor candidate mass degrades as n grows (d03's scale twin; the fixed
    * 64/16 registry form stays the oracle-gated demo point).
    */
  def minhashLshPairsAuto(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, missTarget: Double = 1e-3, maxK: Int = 512,
      maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val n = df.count()
    val (k, bands) = minhashOperatingPoint(n, threshold, missTarget, maxK)
    val pin = n >= PinLayoutMinDocs
    lastAutoPoint = (k, bands, pin)
    minhashLshPairs(df, idCol, textCol, threshold, k, bands, maxDocFreq, scope,
      pinLayout = pin)
  }

  /** The (k, bands, pinCacheLayout) the last [[minhashLshPairsAuto]] call
    * on this JVM chose — benchmark telemetry so a scale row can stamp its
    * operating point AND layout branch into the committed artifact
    * (VERDICT r14 #2: d03auto's task-seconds moved +49 % across rounds and
    * the row could not say whether the auto point or the pin branch moved
    * with corpus realization). Same pattern as
    * [[graft.ops.Similarity.lastAutoPoint]].
    */
  @volatile var lastAutoPoint: (Int, Int, Boolean) = (-1, -1, false)

  /** [[editNearDupPairsLsh]] at the jointly-scaled operating point — the
    * candidate gate (MinHash-LSH) sizes (k, bands) from the corpus the way
    * [[minhashLshPairsAuto]] does, so the Levenshtein verify stage's input
    * mass stays O(n) as the corpus grows (d17's scale twin; the fixed
    * 64/16 registry form stays the oracle-gated demo point).
    */
  def editNearDupPairsLshAuto(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int, threshold: Double = 0.8, missTarget: Double = 1e-3,
      maxK: Int = 512, maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val n = docs.count()
    val (k, bands) = minhashOperatingPoint(n, threshold, missTarget, maxK)
    editNearDupPairsLsh(docs, idCol, textCol, maxDist, threshold, k, bands,
      maxDocFreq, scope, pinLayout = n >= PinLayoutMinDocs)
  }

  /** Incremental NEAR-dup dedup — [[incrementalExactSurvivors]]'s fuzzy
    * sibling, the daily-ingest form of [[minhashLshPairs]]: survivors among
    * the incoming batch (rows matching `incomingPred`; NULL counts as
    * history) are docs with no verified-Jaccard ≥ `threshold` partner in
    * the accepted history NOR among earlier (smaller-id) incoming docs.
    * Returns the surviving incoming rows' (idCol).
    *
    * Scale shape: candidate generation joins the incoming side's band
    * buckets against ALL buckets — never history×history (the quadratic
    * mass a union self-join would recompute every day). At corpus scale the
    * history bucket/shingle tables are written bucketed by (band, bh) /
    * hash once, so a daily batch co-locates against them with no history
    * re-shuffle — the same discipline as [[incrementalExactSurvivors]].
    * Recall is d03's LSH guarantee (P(miss | j≥0.8) < 1e-7 at 64/16).
    *
    * ORACLE/REGISTRY form: fixed (k, bands) is the oracle contract;
    * production callers at corpus scale use [[incrementalNearDupAuto]].
    */
  def incrementalNearDupSurvivors(df: DataFrame, idCol: String, textCol: String,
      incomingPred: Column, threshold: Double = 0.8, k: Int = 64, bands: Int = 16,
      maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged,
      pinLayout: Boolean = false): DataFrame = {
    val pred = coalesce(incomingPred, lit(false))
    val tagged = df.withColumn("_inc", pred)
    // one shingle table for BOTH sides: sizes and intersections live in the
    // same df-capped space, so verified Jaccard is consistent everywhere.
    // Cache layout conditionally pinned by idCol — see [[pinCacheLayout]].
    val hashed = scope.cached(pinCacheLayout(capDocFreq(
      shingleSet(tagged, idCol, textCol)
        .select(col(idCol), xxhash64(col("shingle")).as("sh")),
      maxDocFreq), col(idCol), force = pinLayout))
    val flags = tagged.select(col(idCol), col("_inc"))
    val buckets = bandBuckets(
      minhashSignaturesHashed(hashed, idCol, k), idCol, k, bands,
      maxBucket = maxDocFreq)
      .join(flags, idCol)
    val inc = buckets.filter(col("_inc"))
      .select(col(idCol).as("d2"), col("band"), col("bh"))
    // candidates: (any doc, incoming doc) sharing a band cell, minus
    // history×history by construction; an inc-inc pair only dirties the
    // LATER doc, a history partner dirties the incoming doc at any id
    val cands = buckets
      .select(col(idCol).as("d1"), col("_inc").as("inc1"), col("band"), col("bh"))
      .join(inc, Seq("band", "bh"))
      .filter(!col("inc1") || col("d1") < col("d2"))
      .filter(col("d1") =!= col("d2"))
      .select("d1", "d2").distinct()
    val sizes = hashed.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val dirty = cands
      .join(hashed.select(col(idCol).as("d1"), col("sh")), "d1")
      .join(hashed.select(col(idCol).as("d2"), col("sh")), Seq("d2", "sh"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("d1"), col("sz").as("n1")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("sz").as("n2")), "d2")
      .filter(col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")).cast("double") >= threshold)
      .select(col("d2").as(idCol)).distinct()
    df.filter(pred).select(col(idCol)).join(dirty, Seq(idCol), "left_anti")
  }

  /** [[incrementalNearDupSurvivors]] at the jointly-scaled operating point:
    * (k, bands) are sized from the FULL corpus (history + incoming batch)
    * because the candidate join runs incoming buckets against ALL buckets —
    * the background-collision mass that the band width must control is the
    * history side's, which dominates at steady state (d13's scale twin;
    * the fixed 64/16 registry form stays the oracle-gated demo point).
    */
  def incrementalNearDupAuto(df: DataFrame, idCol: String, textCol: String,
      incomingPred: Column, threshold: Double = 0.8, missTarget: Double = 1e-3,
      maxK: Int = 512, maxDocFreq: Long = DefaultMaxDocFreq,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val n = df.count()
    val (k, bands) = minhashOperatingPoint(n, threshold, missTarget, maxK)
    incrementalNearDupSurvivors(df, idCol, textCol, incomingPred, threshold,
      k, bands, maxDocFreq, scope, pinLayout = n >= PinLayoutMinDocs)
  }

  /** SimHash via bit votes: sig bit b = 1 iff Σ_tokens (bit b of hash ? +1 : -1) > 0.
    * Two groupBys; the single-shuffle custom-aggregate variant is
    * `graft.functions.simhash_agg` (TypedImperativeAggregate).
    */
  def simhashViaBits(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = TextOps.spreadCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val masks = typedlit((0 until 64).map(b => 1L << b))
    val bitVotes = tok.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(63)), b =>
        when(col("h").bitwiseAND(element_at(masks, (b + 1).cast("int"))) =!= 0,
          lit(1)).otherwise(lit(-1)))).as(Seq("bit", "vote")))
    bitVotes.groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col(idCol))
      .agg(sum(when(col("v") > 0,
        element_at(typedlit((0 until 64).map(b => 1L << b)),
          (col("bit") + 1).cast("int"))).otherwise(0L)).as("simhash"))
  }

  /** SimHash via the custom single-shuffle aggregate
    * (`graft.functions.SimHashAgg`) — the 100 TB path: one partial-aggregated
    * shuffle with a 256-byte buffer instead of 64 bit-vote rows per token.
    */
  def simhashAggregate(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextOps.spreadCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .groupBy(col(idCol))
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h")).as("simhash"))

  /** [[simhashAggregate]] on the oracle-replayable 63-bit token hash
    * ([[graft.functions.HashKernels.fmixToken63]]: rolling64 halves →
    * fmix32 split-multiply) instead of xxhash64 — identical plan shape
    * (explode → ONE partial-aggregated shuffle), but every signature bit
    * is recomputable in DuckDB, so the full SimHash chain (token hash →
    * bit votes → signature → banded pairs) carries a value-level oracle
    * (d04). The xxhash64 form stays the production twin (pinned
    * pair-equivalent on the fixture corpus in OpsSpec).
    */
  def simhashAggregateFmix(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextOps.spreadCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", graft.functions.FmixTokenHash63.fmix_token_hash63(col("tok")))
      .groupBy(col(idCol))
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h")).as("simhash"))

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist (≤ 3), using the
    * 4×16-bit chunk pigeonhole: pairs within distance 3 share at least one
    * exact chunk → candidate generation is 4 equality joins, not O(n²).
    */
  def simhashPairs(sigs: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk pigeonhole only covers hamming <= 3")
    val chunks = sigs.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))
            .as("cv"))): _*)).as("e"))
      .select(col(idCol), col("simhash"), col("e.chunk"), col("e.cv"))
    val cands = chunks.as("x").join(chunks.as("y"), Seq("chunk", "cv"))
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("d1"), col(s"x.simhash").as("s1"),
        col(s"y.$idCol").as("d2"), col(s"y.simhash").as("s2"))
      .distinct()
    cands.withColumn("hamming",
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("d1", "d2", "hamming")
  }
}
