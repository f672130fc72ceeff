package graft

import org.apache.spark.sql.functions._

import graft.ops.ConnectedComponents

/** Connected components on hand-built graphs: the fixtures force multiple
  * large-star/small-star rounds (long paths), exercise merging (shared
  * nodes), and pin the exact (node, rep) labeling.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two separate components labeled by their minima") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long path converges (forces several rounds)") {
    // a 60-node path: worst case for label propagation — the minimum is at
    // one end and must reach the other through the star contractions.
    val edges = (0L until 59L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.size == 60 && got.values.forall(_ == 0L))
  }

  test("path with minimum in the middle") {
    // ids descend then ascend: 50-49-...-1-0-101-102-...-150
    val left = (1L to 50L).map(i => (i, i - 1))
    val right = Seq((0L, 101L)) ++ (101L until 150L).map(i => (i, i + 1))
    val got = cc(left ++ right)
    assert(got.size == 101 && got.values.forall(_ == 0L))
  }

  test("duplicate edges, reversed orientation and self-loops are harmless") {
    val got = cc(Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge set yields empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.run(empty, "a", "b").count() == 0L)
  }

  test("star graph and bridged clusters merge into one component") {
    // two dense clusters bridged by one edge — a near-dup-cluster shape
    val c1 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val c2 = for (i <- 20L to 24L; j <- (i + 1) to 24L) yield (i, j)
    val bridged = cc(c1 ++ c2 ++ Seq((5L, 20L)))
    assert(bridged.values.toSet == Set(1L))
    val separate = cc(c1 ++ c2)
    assert(separate.filter(_._1 >= 20L).values.toSet == Set(20L))
    assert(separate.filter(_._1 < 20L).values.toSet == Set(1L))
  }
}
