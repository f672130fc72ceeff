package graft

/** Regression net: every registry query must run on sf0.001 and every
  * oracle-less query is consciously documented. Catches runtime breakage
  * in `sbt test` without waiting for the driver's verify round.
  */
class QueryRegistrySpec extends SparkSpec {

  // EMPTY since r11: d04 — the last holdout — graduated via the
  // fmixToken63 oracle-replayable token hash (s04 left in r9, s02/t06 in
  // r10). Every registry row now carries a full DuckDB value oracle.
  private val knownRowsOnly = Set.empty[String]
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

  test("s02 oracle's hardcoded probe-mask VALUES equals hammingMasks(6, 1)") {
    // The DuckDB oracle replays the multiprobe neighborhood as a literal
    // VALUES list; the Scala side generates it from hammingMasks(planes,
    // probeHamming). If someone bumps planes/probeHamming in the s02
    // registry call without touching the oracle, the row would go red with
    // no hint why — this pin fails FIRST, naming the drift (VERDICT r10 #5).
    val sql = SparkEntry.oracleSql("s02_ann_hyperplane").replaceAll("\\s+", "")
    val masks = graft.ops.Similarity.hammingMasks(6, 1)
    val literal = masks.map(m => s"($m)").mkString("(VALUES", ",", ")")
    assert(sql.contains(literal),
      s"s02 oracle probe-mask literal drifted from hammingMasks(6,1)=$masks")
    // and the registry call itself runs the defaults the literal encodes
    assert(masks == Seq(0L, 1L, 2L, 4L, 8L, 16L, 32L))
  }

  test("query names are unique and oracle keys are a subset") {
    val names = SparkEntry.registry.map(_._1)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
