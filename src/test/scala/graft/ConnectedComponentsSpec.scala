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

  test("non-transitive pair triple merges (shared-child star set)") {
    // C pairs with A and B, but A does not pair with B — the canonical
    // edge set {(3,1),(3,2)} has no node on both sides yet is NOT a
    // disjoint union of stars (child 3 has two roots). A convergence test
    // that only checks side-disjointness declares victory here and returns
    // two conflicting reps for node 3; the disjoint-stars test must force
    // another round until all three nodes share rep 1.
    assert(cc(Seq((1L, 3L), (2L, 3L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // same shape, more children/roots interleaved
    assert(cc(Seq((10L, 30L), (20L, 30L), (20L, 40L))) ==
      Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L))
  }

  test("randomized graphs match a driver-side union-find") {
    val rnd = new scala.util.Random(0xC0FFEEL)
    for (trial <- 1 to 6) {
      val n = 40 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side union-find oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(t => Seq(t._1, t._2)).distinct
        val comps = nodes.groupBy(find).map { case (_, ns) =>
          ns.toSet -> ns.min
        }
        val expected = comps.flatMap { case (ns, mn) => ns.map(_ -> mn) }.toMap
        assert(cc(edges) == expected, s"trial $trial: n=$n m=$m")
      }
    }
  }

  test("giant bridged stars: big component labels correctly, no Window op") {
    // two 25k-child hubs bridged by one edge — after round 1 the surviving
    // root's neighbor list IS the whole component. The windowed-min
    // formulation funnels those rows through one task; the partial-agg
    // formulation combines map-side. Assert correctness AND that the star
    // rounds' physical plans aggregate partially instead of windowing.
    val big = (1L to 25000L).map(i => (i * 4, 0L)) ++
      (1L to 25000L).map(i => (i * 4 + 1, 1L)) ++ Seq((0L, 1L))
    val small = (200000L until 200400L by 2).map(i => (i, i + 1))
    val got = cc(big ++ small)
    assert(got.size == 50002 + 400)
    assert(got.filter(_._1 < 200000L).values.forall(_ == 0L))
    assert(got.filter(_._1 >= 200000L).forall { case (n, r) => r == (n / 2) * 2 })
  }

  test("star-round plans use partial aggregation, not Window") {
    import spark.implicits._
    val e = Seq((5L, 1L), (4L, 1L), (3L, 2L)).toDF("u", "v")
    for (round <- Seq(ConnectedComponents.largeStar(e),
        ConnectedComponents.smallStar(e))) {
      val plan = round.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), plan)
      assert(plan.contains("HashAggregate"), plan)
      assert(plan.toLowerCase.contains("partial_min"), plan)
    }
  }

  test("fused convergence count agrees with the standalone isDisjointStars") {
    // canonical (u > v, distinct) fixtures spanning: converged single star,
    // converged disjoint stars, the non-transitive shared-child triple
    // (child with two roots — the case a side-disjointness test misses),
    // a root that is also a child, and a long-path fragment
    val fixtures: Seq[Seq[(Long, Long)]] = Seq(
      Seq((2L, 1L), (3L, 1L)),                       // one star: converged
      Seq((2L, 1L), (3L, 1L), (11L, 10L)),           // disjoint stars
      Seq((3L, 1L), (3L, 2L)),                       // child 3, roots 1 and 2
      Seq((2L, 1L), (3L, 2L)),                       // 2 is child AND root
      (1L until 6L).map(i => (i + 1, i)),            // path
      Seq.empty[(Long, Long)])                       // empty set
    fixtures.foreach { fx =>
      val e = fx.toDF("u", "v")
      val obs = org.apache.spark.sql.Observation()
      // materialize the fused round the way run() does (localCheckpoint)
      ConnectedComponents.largeStarChecked(e, Some(obs)).localCheckpoint(true)
      val viol = obs.get.get("viol")
        .collect { case n: Number => n.longValue }.getOrElse(0L)
      val reference = ConnectedComponents.isDisjointStars(e)
      assert((viol == 0L) === reference,
        s"fused=$viol reference=$reference on $fx")
      // and the fused form's EDGE OUTPUT is exactly largeStar's
      val got = ConnectedComponents.largeStarChecked(e, None)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = e.union(e.select(col("v"), col("u")))
        .groupBy(col("u")).agg(org.apache.spark.sql.functions.min("v").as("mv"))
        .join(e.union(e.select(col("v").as("u"), col("u").as("v"))), "u")
        .filter(col("v") > col("u"))
        .select(col("v"), least(col("mv"), col("u")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === want, s"largeStar output changed on $fx")
    }
  }

  test("one action per round: the fused loop runs no separate check actions") {
    // actions for an r-round graph: 1 initial save + (r+1) fused round
    // materializations (the last proves the previous output converged) and
    // NOTHING else — the OLD loop additionally ran an isDisjointStars
    // isEmpty action per round. Count query executions by action name.
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { actions.add(funcName); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val edges = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
      val labeled = ConnectedComponents.run(edges, "a", "b")
      // listener events post asynchronously — wait until the count settles
      val deadline = System.currentTimeMillis() + 5000
      var last = -1
      while (last != actions.size() && System.currentTimeMillis() < deadline) {
        last = actions.size(); Thread.sleep(200)
      }
      import scala.jdk.CollectionConverters._
      val names = actions.asScala.toSeq
      val rounds = ConnectedComponents.lastRunRounds
      assert(rounds >= 1)
      // every action is a checkpoint materialization; no isEmpty/count
      // convergence actions remain
      assert(names.forall(_.toLowerCase.contains("checkpoint")),
        s"non-checkpoint actions ran: $names")
      assert(names.size === 1 + rounds + 1,
        s"expected 1 save + ${rounds + 1} fused round actions, got $names")
      assert(labeled.collect().length === 9)
    } finally spark.listenerManager.unregister(l)
  }

  test("reliable checkpoint path labels identically") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-cc-ckpt").toString
    val edges = ((0L until 30L).map(i => (i, i + 1)) ++ Seq((50L, 51L)))
      .toDF("a", "b")
    val got = ConnectedComponents
      .run(edges, "a", "b", checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 33)
    assert(got.filter(_._1 <= 31L).values.forall(_ == 0L))
    assert(got(50L) == 50L && got(51L) == 50L)
  }
}
