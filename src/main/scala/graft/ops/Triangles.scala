package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the third graph primitive next to
  * [[ConnectedComponents]] (grouping) and [[PageRank]] (ranking): local
  * clustering structure, the signal behind community density and
  * link-spam/boilerplate detection on similarity graphs.
  *
  * Algorithm: degree-ordered edge orientation, the standard distributed
  * formulation (Suri & Vassilvitskii's MR triangle counting). Every
  * undirected edge is directed from its (degree, id)-smaller endpoint to the
  * larger, which makes the orientation acyclic and counts each triangle
  * exactly once as a directed wedge s→t, t→w closed by s→w. The payoff at
  * scale: max out-degree after orientation is O(√m) regardless of how
  * skewed the raw degree distribution is, so the wedge join's worst key is
  * bounded — hub nodes (the power-law failure mode of naive 3-way
  * self-joins) orient their edges AWAY from themselves.
  *
  * Shuffle shape: two equality joins (wedge build + closing-edge check) and
  * one partial-aggregatable count — all on node/edge keys, AQE-splittable,
  * nothing driver-side.
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * Input is canonicalized internally (self-loops dropped, reversed rows
    * folded, duplicates collapsed — a wrong count would be SILENT, unlike
    * PageRank's loud require, so the guard is built in). Already-canonical
    * input (the common case, e.g. g02's `DISTINCT u < v` edge build) pays
    * one redundant edge-list distinct, the same shuffle shape as the deg
    * groupBy next to it.
    *
    * @param edges undirected edge list, one row per edge as (u, v)
    * @return (node, n_triangles) for every node in `edges`, zeros included
    */
  def perNode(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    val sym = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
    val o = e0
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("t"))
    val tri = o.as("a")
      .join(o.as("b"), col("a.t") === col("b.s"))
      .join(o.as("c"),
        col("c.s") === col("a.s") && col("c.t") === col("b.t"))
      .select(col("a.s").as("x"), col("a.t").as("y"), col("b.t").as("z"))
    val credits = tri.select(explode(array(col("x"), col("y"), col("z")))
      .as("node"))
    val counts = credits.groupBy("node").agg(count(lit(1)).as("n"))
    deg.select(col("node"))
      .join(counts, Seq("node"), "left")
      .select(col("node"), coalesce(col("n"), lit(0L)).as("n_triangles"))
  }
}
