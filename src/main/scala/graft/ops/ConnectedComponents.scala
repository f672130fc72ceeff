package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, via alternating
  * large-star / small-star rounds (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014 — the standard O(log²·) shuffle-round
  * algorithm; in practice a handful of rounds).
  *
  * This is the clustering step a dedup pipeline needs after pair generation:
  * near-dup PAIRS (from [[Dedup.minhashLshPairs]] / [[Dedup.simhashPairs]])
  * become canonical clusters, each labeled by its minimum member, so "keep
  * one representative per cluster" is a filter, not a graph walk.
  *
  * Scale design (100 TB discipline):
  *  - iterations run on the EDGE set only (near-dup pairs ≪ corpus);
  *  - the per-node minimum in each star operation is a `groupBy.agg(min)` —
  *    a PARTIAL (map-side-combinable) aggregate — joined back to the edges.
  *    The star algorithm concentrates a component's edge set onto its root,
  *    so a windowed formulation (`min over partitionBy(u)`) would funnel a
  *    giant component's entire neighbor list through ONE task; the partial
  *    aggregate combines per input partition first, and the join-back is a
  *    key-equality join AQE can skew-split. Hot keys cost one streaming
  *    pass, never one task's memory;
  *  - every round ends in a checkpoint, truncating the logical plan: each
  *    round references its input ~3×, so an unchecked plan tree grows
  *    3^rounds and the optimizer dies long before the executors do.
  *    `localCheckpoint` (default) is cheap but stores blocks only on
  *    executors — one lost executor mid-round kills the job (lineage is
  *    truncated). For cluster deployments pass `checkpointDir` to use
  *    reliable `checkpoint()` into fault-tolerant storage instead;
  *  - convergence ("every child has exactly one root, no root is also a
  *    child") is decided INSIDE each round's materialization job: the
  *    per-node predicate rides largeStar's own minimum aggregate and its
  *    global count crosses to the driver as one observed metric — never a
  *    separate check job, never a driver-side collect of the data (see
  *    [[largeStarChecked]] and the loop in [[run]]).
  */
object ConnectedComponents {
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Rounds the most recent [[run]] in this JVM took to converge — bench
    * telemetry (ADVICE r12: the INFO log line is invisible under the
    * bench sessions' ERROR log level, so the d06 scale rows couldn't
    * attribute a slow run to an extra large/small-star round). -1 until a
    * run completes. Driver-side, set once per run at convergence; bench
    * rows run serially per JVM, so last-writer is the row's own run.
    */
  @volatile var lastRunRounds: Int = -1


  /** Label every node reachable from `edges` with the minimum node id in its
    * component. Returns (node, rep) — one row per distinct endpoint; nodes
    * not present in `edges` (singletons) are absent, callers attach them
    * with `coalesce(rep, id)` after an outer join.
    *
    * @param edges     undirected edge list; self-loops and duplicates are fine
    * @param srcCol    source-id column (numeric or any orderable type)
    * @param dstCol    destination-id column
    * @param maxRounds backstop on large-star/small-star rounds; the algorithm
    *                  provably converges in O(log² n) rounds (2–5 observed on
    *                  real near-dup graphs), so hitting this indicates a bug,
    *                  not a big graph — we throw rather than return a wrong
    *                  partial labeling.
    * @param checkpointDir when set, rounds checkpoint reliably into this
    *                  fault-tolerant directory (survives executor loss — the
    *                  right choice on a real cluster); when None, rounds use
    *                  `localCheckpoint` (fast, executor-memory-resident,
    *                  fine for single-JVM / short jobs).
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30, checkpointDir: Option[String] = None): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // Respect a checkpoint dir the session already configured — overriding
    // it would mutate global SparkContext state under concurrent jobs.
    // Superseded per-round checkpoint files are reaped by the ContextCleaner
    // because GraftSession enables cleanCheckpoints; without it, reliable
    // checkpoints outlive the loop until the job ends.
    checkpointDir.foreach(d => if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d))
    def save(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)

    // canonical undirected form: (u = larger, v = smaller), no self-loops.
    // Checkpointed: each round references its input ~3 times, and the input
    // here is often an expensive pair-generation pipeline.
    var e = save(edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())

    // FUSED convergence check (VERDICT r16 #4): the old loop paid TWO jobs
    // per round — the checkpoint materialization plus a separate
    // isDisjointStars aggregate. The disjoint-stars test of a round's INPUT
    // is exactly a per-node predicate over largeStar's own per-node minimum
    // aggregate, so each round's materialization now computes it for free
    // via an `observe` on that aggregate ([[largeStarChecked]] — a global
    // violation count, partial-agg-combined like the min itself, no extra
    // grouping, no hot-key exposure). One job per round. The price is that
    // e_i's verdict arrives with round i+1's output: the loop learns it
    // converged one round late and runs one extra round on the FINAL star
    // set — a no-op by the fixed-point property (largeStar and smallStar
    // leave a disjoint union of stars exactly unchanged, so the discarded
    // output EQUALS the input), and the final star set is the run's
    // smallest edge set, so the extra round costs about what the (r+1)
    // eliminated check jobs cost at scale and strictly less locally, where
    // per-job latency dominates both.
    var round = 0
    var converged = false
    while (!converged) {
      val obs = org.apache.spark.sql.Observation()
      val next = save(smallStar(largeStarChecked(e, Some(obs))))
      // sum() over an empty mins table (empty edge set) observes null
      val violations = obs.get.get("viol")
        .collect { case n: Number => n.longValue }.getOrElse(0L)
      if (violations == 0L) converged = true
      else if (round >= maxRounds)
        throw new IllegalStateException(
          s"connected components did not converge in $maxRounds rounds")
      else { e = next; round += 1 }
    }
    // rounds × shuffles is the scale risk of any iterative op — record the
    // observed count so a scale run's telemetry records convergence cost
    // (the field, not the log line, is what the bench reads: bench sessions
    // run at ERROR log level)
    lastRunRounds = round
    log.info(s"connected components converged in $round large/small-star rounds")
    // every edge is (child, root = component minimum); roots appear only on
    // the v side and each child has exactly one root.
    e.select(col("u").as("node"), col("v").as("rep"))
      .union(e.select(col("v").as("node"), col("v").as("rep")))
      .distinct()
  }

  /** Large-star: for each node u, connect every LARGER neighbor to the
    * minimum of Γ(u) ∪ {u}. Keeps components intact, pulls high nodes
    * toward local minima. The per-node minimum is a partial aggregate
    * (map-side combine — a giant star's neighbor list is reduced inside
    * each input partition before the shuffle) joined back on the node key.
    * Output stays canonical (first col > second) but may carry duplicates —
    * small-star's closing distinct absorbs them, so deduping here would be
    * a wasted shuffle.
    */
  private[graft] def largeStar(e: DataFrame): DataFrame =
    largeStarChecked(e, None)

  /** [[largeStar]] with the disjoint-stars test of its INPUT fused into the
    * per-node minimum aggregate (see the loop in [[run]]). The
    * bi-orientation is a single-pass explode (two struct rows per edge) —
    * the union-of-two-selects form scans the checkpointed input twice — and
    * carries a child/root flag so `mins` can also aggregate, per node, the
    * child-side edge count and a was-ever-a-root bit. Both are plain
    * partial aggregates (map-side combined like the min itself — a giant
    * star still costs one streaming pass, never one task's memory). The
    * per-node violation predicate is [[isDisjointStars]]'s verbatim
    * (`nc > 1` — a child with two roots — or child AND root), and its
    * global sum rides the materialization as an observed metric: zero extra
    * jobs, zero extra shuffles.
    */
  private[graft] def largeStarChecked(e: DataFrame,
      obs: Option[org.apache.spark.sql.Observation]): DataFrame = {
    val vType = e.schema("v").dataType
    val bi = e.select(explode(array(
        struct(col("u").as("n"), col("v").as("p"), lit(1).as("c")),
        struct(col("v").as("n"), col("u").cast(vType).as("p"), lit(0).as("c"))))
        .as("s"))
      .select(col("s.n").as("u"), col("s.p").as("v"), col("s.c").as("c"))
    val mins0 = bi.groupBy("u").agg(min(col("v")).as("mv"),
      sum(col("c")).as("nc"), max(lit(1) - col("c")).as("isRoot"))
    val mins = obs.fold(mins0) { o =>
      mins0
        .withColumn("_viol", (col("nc") > 1 ||
          (col("nc") >= 1 && col("isRoot") === 1)).cast("long"))
        .observe(o, sum(col("_viol")).as("viol"))
    }
    bi.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mv"), col("u")).as("v"))
  }

  /** Small-star: orient edges toward smaller ids, then connect every smaller
    * neighbor (and u itself) to the minimum neighbor. Same partial-agg +
    * join-back shape as [[largeStar]]. Output canonical and distinct.
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    // e is already canonical (u > v) — Γ(u) below is exactly the smaller
    // neighbors, so m = min(Γ(u)) ≤ every emitted partner.
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    val withM = e.join(mins, "u")
    withM.select(col("v").as("n"), col("m"))
      .union(withM.select(col("u").as("n"), col("m")))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
  }

  /** True iff the canonical edge set is a DISJOINT union of stars — the
    * algorithm's true fixed point and a correct labeling (star operations
    * preserve connectivity, so each star is then exactly one component,
    * rooted at its minimum). Since r17 the production loop computes this
    * predicate fused into each round ([[largeStarChecked]]); this
    * standalone form is kept as the spec's independent reference — the
    * fused count must agree with it on every fixture. Two conditions, both
    * required:
    *
    *  1. every child has exactly one root — child-side count == 1
    *     everywhere. Without this, a child bridging two roots (edges
    *     (3,1),(3,2): C pairs with A and B but A,B don't pair — a
    *     non-transitive near-dup triple) would pass a mere "no node on both
    *     sides" test and the two components would never merge;
    *  2. no node appears both as a child (u side) and a root (v side).
    *
    * Both conditions fold into ONE partial aggregate over the (checkpointed,
    * already-small) edge set — a single Spark job per round, no semi-join,
    * no data collect. The child-side count equals the distinct-root count
    * because `e` is distinct at every point this is called (initial
    * distinct / small-star output).
    */
  private[graft] def isDisjointStars(e: DataFrame): Boolean =
    e.select(col("u").as("n"), lit(1).as("child"), lit(0).as("root"))
      .union(e.select(col("v").as("n"), lit(0).as("child"), lit(1).as("root")))
      .groupBy("n")
      .agg(sum(col("child")).as("nc"), max(col("root")).as("isRoot"))
      .filter(col("nc") > 1 || (col("nc") >= 1 && col("isRoot") === 1))
      .isEmpty
}
