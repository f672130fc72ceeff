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
    // canonical undirected form: (u = larger, v = smaller), no self-loops
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    var prevSig = checksum(e)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val sig = checksum(next)
      converged = sig == prevSig
      prevSig = sig
      e = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds")
    // fixed point = union of stars: every edge is (child, root = component
    // minimum); roots appear only on the v side.
    e.select(col("u").as("node"), col("v").as("rep"))
      .union(e.select(col("v").as("node"), col("v").as("rep")))
      .distinct()
  }

  /** Large-star: for each node u, connect every LARGER neighbor to the
    * minimum of Γ(u) ∪ {u}. Keeps components intact, pulls high nodes
    * toward local minima. Output stays canonical (first col > second).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val bi = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = bi.groupBy("u").agg(min(col("v")).as("_mn"))
      .select(col("u"), least(col("_mn"), col("u")).as("m"))
    bi.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: orient edges toward smaller ids, then connect every smaller
    * neighbor (and u itself) to the minimum neighbor. Output canonical.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    // e is already canonical (u > v) — Γ(u) below is exactly the smaller
    // neighbors, so m = min(Γ(u)) ≤ every emitted partner.
    val m = e.groupBy("u").agg(min(col("v")).as("m"))
    val viaNeighbors = e.join(m, "u")
      .select(col("v").as("n"), col("m"))
    val viaCenter = m.select(col("u").as("n"), col("m"))
    viaNeighbors.union(viaCenter)
      .filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Order-insensitive fingerprint of an edge set: (count, XOR xxhash64(u,v)).
    * XOR-fold instead of sum: immune to ANSI-mode long overflow, and edges
    * are distinct so nothing cancels. Equal fingerprints on consecutive
    * rounds ⇒ the edge set is stable (a 2⁻⁶⁴ collision aside — and a false
    * "converged" would still be a valid stop only one round early, since a
    * true fixed point is itself stable).
    */
  private def checksum(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }
}
