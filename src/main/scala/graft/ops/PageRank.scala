package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank — iterative graph rank over an edge list, the
  * companion to [[ConnectedComponents]] for weighing what CC only groups
  * (e.g. rank the members of a near-dup cluster, or score documents by
  * citation/co-occurrence centrality when picking cluster survivors).
  *
  * Exactness discipline: ranks live in integer units of `scale` (ppm by
  * default) and every division is integral (`div`, truncating — all values
  * are non-negative so truncation == floor == DuckDB's `//`). With a FIXED
  * round count the whole trajectory is order-independent integer math, so a
  * SQL engine replays it bit-for-bit with chained CTEs — the same
  * replay-the-trajectory oracle pattern as s09's k-means.
  *
  * Scale shape (100 TB discipline):
  *  - per round: ONE join (edges ⋈ state on src) and ONE aggregate
  *    (contributions by dst). State is (node, deg, pr) — 24 bytes/node —
  *    never wider.
  *  - the dst aggregate is a partial-aggregatable SUM, so power-law hub
  *    nodes (the skew case for rank) combine map-side before the shuffle;
  *    no salting needed.
  *  - rounds is a small constant (plan depth stays bounded; no lineage
  *    checkpoint needed — unlike CC, the iteration count does not grow
  *    with graph size).
  *  - on a real cluster, bucket `edges` by src to make the per-round join
  *    co-located; the contribution shuffle on dst is inherent to the
  *    algorithm.
  */
object PageRank {

  /** Run `rounds` damped PageRank iterations over a DIRECTED edge list
    * (symmetrize before calling for an undirected graph — the g01 pattern,
    * `e0 UNION ALL reverse(e0)`). Nodes are the distinct endpoints of
    * `edges`; a node appearing only as a dst is dangling (deg 0): it
    * accumulates teleport + damped in-mass but distributes nothing, and —
    * as in the classic simplified formulation — its mass is NOT
    * redistributed to the rest of the graph.
    *
    * pr₀ = scale;  prₜ₊₁ = ((100−d_num)·scale) div 100
    *               + (d_num · Σ_{(v,u)∈E} (prₜ(v) div deg(v))) div 100
    * with the damping factor d = d_num/100 (default 85/100 = 0.85).
    *
    * @return (node, deg, pr) with pr in integer `scale` units
    */
  def run(edges: DataFrame, rounds: Int = 3, scale: Long = 1000000L,
      dampingPct: Int = 85): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"rounds must be in [1,20] (fixed small constant — plan depth grows " +
        s"linearly with it): $rounds")
    require(dampingPct > 0 && dampingPct < 100, s"dampingPct: $dampingPct")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // node set = ALL endpoints, so dst-only (dangling) nodes are ranked
    // too instead of silently dropped; for a symmetrized graph the
    // endpoint distinct coincides with the src set and adds one
    // edge-list-sized distinct next to the deg groupBy
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val p0 = nodes
      .join(deg.select(col("src").as("node"), col("deg")), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"),
        lit(scale).as("pr"))
    val teleport = scale * (100L - dampingPct) / 100L
    (1 to rounds).foldLeft(p0) { (state, _) =>
      val contrib = e.join(state, e("src") === state("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
      val sums = contrib.groupBy("dst").agg(sum(col("c")).as("s"))
      state.join(sums, state("node") === sums("dst"), "left")
        .select(col("node"), col("deg"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(s, 0L)) div 100")).as("pr"))
    }
  }
}
