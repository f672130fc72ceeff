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
  *  - each round is two shuffles (groupBy min-label + join back), both keyed
  *    by node id — no all-pairs step anywhere;
  *  - every round ends in `localCheckpoint`, truncating the logical plan:
  *    each round references its input ~3×, so an unchecked plan tree grows
  *    3^rounds and the optimizer dies long before the executors do
  *    (superseded checkpoint RDDs are dropped by the ContextCleaner once
  *    the loop releases them, the same lifecycle unmanaged caches use);
  *  - convergence is detected from a constant-size checksum aggregate
  *    (count + order-insensitive hash-sum), not a driver-side collect.
  */
object ConnectedComponents {

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
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30): DataFrame = {
    // canonical undirected form: (u = larger, v = smaller), no self-loops.
    // Checkpointed: each round references its input ~3 times, and the input
    // here is often an expensive pair-generation pipeline.
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    // Convergence = the edge set is a union of stars (every edge is
    // (child, root)), which by Kiveris et al. Thm 1-3 is exactly the fixed
    // point of the star operations. Checking "no node is both a child and a
    // root" directly (one semi-join on the checkpointed set) converges one
    // full round earlier than comparing consecutive edge-set fingerprints —
    // on real near-dup graphs (mostly pairs/triangles) that is 1 round
    // instead of 2, i.e. ~half the shuffles.
    var converged = isStarSet(e)
    var round = 0
    while (!converged && round < maxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint(true)
      converged = isStarSet(e)
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds")
    // every edge is (child, root = component minimum); roots appear only on
    // the v side.
    e.select(col("u").as("node"), col("v").as("rep"))
      .union(e.select(col("v").as("node"), col("v").as("rep")))
      .distinct()
  }

  /** Large-star: for each node u, connect every LARGER neighbor to the
    * minimum of Γ(u) ∪ {u}. Keeps components intact, pulls high nodes
    * toward local minima. The per-node minimum rides along as a window
    * aggregate over the SAME shuffle that groups the neighbors — one
    * exchange per round instead of groupBy + join-back (at near-dup edge
    * cardinalities the rounds are stage-overhead-bound, not data-bound).
    * Output stays canonical (first col > second) but may carry duplicates —
    * small-star's closing distinct absorbs them, so deduping here would be
    * a wasted shuffle.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bi = e.union(e.select(col("v").as("u"), col("u").as("v")))
    bi.withColumn("m",
        least(min(col("v")).over(Window.partitionBy(col("u"))), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: orient edges toward smaller ids, then connect every smaller
    * neighbor (and u itself) to the minimum neighbor. Same single-exchange
    * window shape as [[largeStar]]; both emitted branches reuse that
    * exchange. Output canonical and distinct.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // e is already canonical (u > v) — Γ(u) below is exactly the smaller
    // neighbors, so m = min(Γ(u)) ≤ every emitted partner.
    val withM = e.withColumn("m",
      min(col("v")).over(Window.partitionBy(col("u"))))
    withM.select(col("v").as("n"), col("m"))
      .union(withM.select(col("u").as("n"), col("m")))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
  }

  /** True iff no node appears both as a child (u side) and a root (v side) —
    * i.e. the canonical edge set is a union of stars, the algorithm's fixed
    * point. One broadcast-or-shuffle semi-join over the (checkpointed,
    * already-small) edge set.
    */
  private def isStarSet(e: DataFrame): Boolean =
    e.as("a").join(e.as("b"), col("a.v") === col("b.u"), "left_semi").isEmpty
}
