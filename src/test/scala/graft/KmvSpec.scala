package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.KmvAgg.kmv_agg
import graft.ops.Sketches

/** KMV / theta sketch: the bounded-buffer aggregate, the array-level
  * merge/estimate/intersection column functions, and the properties the
  * t26/st10 oracle rows rely on (merge equality, estimator bounds).
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  /** n synthetic keys "key-<i>" for i in [lo, hi), hashed to 60 bits. */
  private def keys(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi)
      .select(Sketches.kmvHash(concat(lit("key-"), col("id"))).as("h"),
        col("id"))

  private def sketchOf(df: DataFrame, k: Int = K): Array[Long] =
    df.agg(kmv_agg(col("h"), k).as("sk")).collect()(0).getSeq[Long](0).toArray

  test("un-full sketch is the exact sorted distinct hash set") {
    val df = keys(0, 40).unionAll(keys(0, 40)) // duplicates must collapse
    val got = sketchOf(df)
    val want = keys(0, 40).select("h").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq)
    assert(got.length == 40)
  }

  test("full sketch is the naive bottom-k distinct, duplicates ignored") {
    val df = keys(0, 5000).unionAll(keys(0, 2500))
    val got = sketchOf(df)
    val want = keys(0, 5000).select("h").distinct()
      .collect().map(_.getLong(0)).sorted.take(K)
    assert(got.toSeq == want.toSeq)
    assert(got.length == K)
  }

  test("partial-merge + serde path: repartitioned input, identical sketch") {
    val narrow = sketchOf(keys(0, 5000).coalesce(1))
    val wide = sketchOf(keys(0, 5000).repartition(16))
    assert(narrow.toSeq == wide.toSeq)
  }

  test("merge of shard sketches equals the whole-corpus sketch") {
    val whole = sketchOf(keys(0, 8000))
    val row = keys(0, 8000)
      .agg(kmv_agg(when(col("id") % 2 === 0, col("h")), K).as("ev"),
        kmv_agg(when(col("id") % 2 =!= 0, col("h")), K).as("od"))
      .select(Sketches.kmvMergeArr(col("ev"), col("od"), K).as("m"))
      .collect()(0)
    assert(row.getSeq[Long](0).toSeq == whole.toSeq)
  }

  test("kmvEstimate: exact when un-full, within 4 sigma when full") {
    val exactEst = keys(0, 30)
      .agg(kmv_agg(col("h"), K).as("sk"))
      .select(Sketches.kmvEstimate(col("sk"), K)).collect()(0).getDouble(0)
    assert(exactEst == 30.0)
    val n = 20000
    val est = keys(0, n)
      .agg(kmv_agg(col("h"), K).as("sk"))
      .select(Sketches.kmvEstimate(col("sk"), K)).collect()(0).getDouble(0)
    val sigma = 1.0 / math.sqrt(K - 2.0)
    assert(math.abs(est - n) <= 4 * sigma * n,
      s"est $est vs $n (4 sigma = ${4 * sigma * n})")
  }

  test("thetaIntersection: exact when un-full, bounded when full") {
    // A = [0, 7000), B = [4000, 10000) -> |A ∩ B| = 3000
    val row = keys(0, 10000)
      .agg(
        kmv_agg(when(col("id") < 7000, col("h")), K).as("a"),
        kmv_agg(when(col("id") >= 4000, col("h")), K).as("b"))
      .select(Sketches.thetaIntersection(col("a"), col("b"), K)).collect()(0)
    // sample rate theta ~ K/7000 -> ~27 common samples; sigma ~ 1/sqrt(27)
    assert(math.abs(row.getDouble(0) - 3000.0) <= 0.75 * 3000.0,
      s"intersection est ${row.getDouble(0)} vs 3000")
    // un-full: sketches ARE the sets -> exact
    val tiny = keys(0, 50)
      .agg(
        kmv_agg(when(col("id") < 30, col("h")), K).as("a"),
        kmv_agg(when(col("id") >= 20, col("h")), K).as("b"))
      .select(Sketches.thetaIntersection(col("a"), col("b"), K)).collect()(0)
    assert(tiny.getDouble(0) == 10.0)
  }

  test("conditional one-pass shard sketches match separately-built ones") {
    val both = keys(0, 3000)
      .agg(kmv_agg(when(col("id") % 2 === 0, col("h")), K).as("ev"),
        kmv_agg(when(col("id") % 2 =!= 0, col("h")), K).as("od"))
      .collect()(0)
    val evSep = sketchOf(keys(0, 3000).filter(col("id") % 2 === 0))
    val odSep = sketchOf(keys(0, 3000).filter(col("id") % 2 =!= 0))
    assert(both.getSeq[Long](0).toSeq == evSep.toSeq)
    assert(both.getSeq[Long](1).toSeq == odSep.toSeq)
  }
}
