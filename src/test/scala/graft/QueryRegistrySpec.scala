package graft

/** Regression net: every registry query must run on sf0.001 and every
  * oracle-less query is consciously documented. Catches runtime breakage
  * in `sbt test` without waiting for the driver's verify round.
  */
class QueryRegistrySpec extends SparkSpec {

  // s04 left this set in r9 (annIvfExact replays s11's integer coarse
  // chain); s02 and t06 in r10 (fmix32 planes / HUGEINT rolling-hash fold
  // replay in DuckDB) — d04 alone remains, gated by its hash-green md5
  // twins d05/d08 (xxhash64 token hashes have no DuckDB equivalent)
  private val knownRowsOnly = Set("d04_simhash_pairs")
  // queries whose sf0.001 result may legitimately be empty (no near-dup
  // pairs / above-threshold rows in the tiny sample)
  private val mayBeEmpty = Set("d02_jaccard_pairs", "d03_minhash_lsh",
    "d04_simhash_pairs", "s03_cosine_neardup")

  test("every query runs at sf0.001; empties and missing oracles are known") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.registry.foreach { case (name, fn, oracle) =>
      val n = fn(spark, dir).count()
      assert(n >= 0)
      if (n == 0)
        assert(mayBeEmpty.contains(name), s"$name unexpectedly empty at sf0.001")
      if (oracle.isEmpty)
        assert(knownRowsOnly.contains(name),
          s"$name has no oracle and is not in the documented rows-only set")
    }
  }

  test("entry() returns rows and protected schema survives the pipeline") {
    val e = SparkEntry.entry(spark)
    assert(e.count() > 0)
  }

  test("query names are unique and oracle keys are a subset") {
    val names = SparkEntry.registry.map(_._1)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
