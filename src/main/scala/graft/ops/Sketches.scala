package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-memory frequency sketches for corpus statistics.
  *
  * At 100 TB a per-token exact count is a vocabulary-sized shuffle; a
  * count-min sketch is `depth × width` cells REGARDLESS of corpus size,
  * partial-aggregated map-side, so the only thing that ever crosses the
  * wire is the sketch itself. The hash chain is md5-derived (not xxhash64)
  * so an external engine can replay every bucket assignment — the same
  * oracle-replayability discipline as the d05/d08 SimHash md5 chain.
  */
object Sketches {

  /** Count-min bucket for one (seed, token): the low 12 bits of
    * md5("<seed>:<token>") (hex chars 30..32 of the 32-char digest) reduced
    * mod `width`. Deterministic, engine-replayable, codegen'd builtins only.
    */
  def cmsBucket(tok: Column, seed: Int, width: Int): Column = {
    require(width > 0 && width <= 4096, s"width must be in (0, 4096], got $width")
    // the 12-bit digest is reduced mod width: a width that does not divide
    // 4096 makes low buckets ceil(4096/width)-likely and high ones
    // floor(4096/width) — a silent estimate-quality skew (ADVICE r13), so
    // only divisors of 4096 (powers of two up to 4096) are accepted
    require(4096 % width == 0,
      s"width must divide 4096 for uniform buckets, got $width")
    conv(substring(md5(concat_ws(":", lit(seed.toString), tok)), 30, 3), 16, 10)
      .cast("long") % width
  }

  /** The count-min sketch of a token stream: one row per (seed, bucket)
    * cell with its collision-summed count. `depth × width` rows out —
    * constant in corpus size. The explode fans each token to `depth`
    * (seed, bucket) cells BEFORE the aggregate, so the map-side partial
    * aggregation collapses the corpus-sized stream to ≤ depth·width cells
    * per task; the shuffle moves only those cells.
    */
  def countMinSketch(tokens: DataFrame, tokCol: String,
      depth: Int = 3, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    tokens
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("seed"),
          cmsBucket(col(tokCol), d, width).as("bucket"))): _*)).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two count-min sketches (same depth/width/hash chain) by
    * cell-wise addition — THE property that makes the sketch a corpus-scale
    * structure: per-day / per-shard sketches fold into the global one
    * without revisiting any token stream. Exactly equal (not just
    * approximately) to sketching the concatenated corpus, because each
    * cell is a plain sum — LayoutSpec pins that equality.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("seed", "bucket")
      .agg(sum("cnt").as("cnt"))

  /** Point estimates from a sketch for a small set of probe tokens
    * (broadcast the sketch — depth·width cells — never the corpus).
    */
  def estimateFor(sketch: DataFrame, probes: DataFrame, tokCol: String,
      depth: Int = 3, width: Int = 1024): DataFrame =
    probes
      .select(col(tokCol).as("tok"),
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("seed"),
            cmsBucket(col(tokCol), d, width).as("bucket"))): _*)).as("sb"))
      .select(col("tok"), col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("seed", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  /** Exact top-k heavy hitters with their count-min estimates side by side:
    * (token, exact count, CMS estimate, the CMS no-underestimate guarantee
    * as a checked column). The exact counts are the verification harness —
    * production reads only the sketch; the estimate path broadcasts the
    * depth·width-cell sketch and probes it with the k candidate tokens, so
    * nothing corpus-sized is joined or collected.
    *
    * Ordering ties break on the token string so the top-k set is
    * deterministic across engines.
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int = 20,
      depth: Int = 3, width: Int = 1024): DataFrame = {
    val toks = docs
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    val top = exact.orderBy(desc("exact_cnt"), asc("tok")).limit(k)
    val sketch = countMinSketch(toks, "tok", depth, width)
    val probes = top.select(col("tok"), col("exact_cnt"),
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("seed"),
            cmsBucket(col("tok"), d, width).as("bucket"))): _*)).as("sb"))
      .select(col("tok"), col("exact_cnt"),
        col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy("tok", "exact_cnt")
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("exact_cnt")).cast("long").as("no_underestimate"))
  }
}
