package graft

import org.apache.spark.sql.functions._

import graft.ops.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Reference fixed-point iteration, same integer arithmetic as the op. */
  private def expected(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var pr = deg.keys.map(_ -> 1000000L).toMap
    (1 to rounds).foreach { _ =>
      val sums = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = pr.keys.map(n => n -> (150000L + 85L * sums.getOrElse(n, 0L) / 100L)).toMap
    }
    pr
  }

  // path graph 1-2-3 plus pendant 4 off the hub 2, symmetrized
  private val star = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 2L -> 4L, 4L -> 2L)

  test("pagerank matches the hand fixed-point iteration on a star") {
    val edges = star.toDF("src", "dst")
    val got = PageRank.run(edges, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected(star, 3))
    // the hub out-ranks every leaf
    assert(got(2L) > got(1L) && got(2L) > got(3L) && got(2L) > got(4L))
  }

  test("pagerank on a symmetric clique is uniform and rank mass is conserved") {
    val nodes = (1L to 5L)
    val clique = for (a <- nodes; b <- nodes if a != b) yield (a, b)
    val got = PageRank.run(clique.toDF("src", "dst"), rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.toSet.size == 1, s"clique ranks must be uniform: $got")
    // every round maps scale -> ~scale for a regular graph (up to div floors)
    assert(math.abs(got(1L) - 1000000L) <= 5)
  }

  test("dst-only (dangling) nodes are ranked with deg 0, not dropped") {
    // 1→2→3 directed chain: 3 never appears as a src
    val g = Seq(1L -> 2L, 2L -> 3L)
    val got = PageRank.run(g.toDF("src", "dst"), rounds = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(3L)._1 == 0L) // dangling: no out-edges
    // round 1: pr(3) = 150000 + 85*(1000000/1)/100; round 2 feeds from
    // pr(2) after round 1 = 150000 + 850000 = 1000000 → same again
    assert(got(3L)._2 == 150000L + 85L * 1000000L / 100L)
    // node 1 receives nothing: teleport only
    assert(got(1L)._2 == 150000L)
  }

  test("pagerank rejects an unbounded round count") {
    val edges = star.toDF("src", "dst")
    intercept[IllegalArgumentException](PageRank.run(edges, rounds = 0))
    intercept[IllegalArgumentException](PageRank.run(edges, rounds = 99))
  }
}
