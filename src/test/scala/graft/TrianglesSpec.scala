package graft

import graft.ops.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every node sits in C(3,2)=3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle with a pendant: pendant counts zero") {
    val g = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    assert(counts(g) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("two triangles sharing an edge credit the shared nodes twice") {
    // 1-2-3 and 2-3-4: nodes 2,3 in both
    val g = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(counts(g) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangle-free graph (star) is all zeros") {
    val star = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L)
    assert(counts(star).values.forall(_ == 0L))
  }

  test("dirty input (dups, reversed rows, self-loops) canonicalizes to the same counts") {
    val clean = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L)
    val dirty = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 1L -> 3L, 3L -> 2L,
      2L -> 3L, 3L -> 4L, 4L -> 4L, 2L -> 2L)
    assert(counts(dirty) == counts(clean))
  }
}
