package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree orientation — the canonical
  * MapReduce-era algorithm (Suri & Vassilvitskii 2011, "Counting Triangles
  * and the Curse of the Last Reducer"). Naive wedge enumeration generates
  * Σ deg(v)² candidate wedges, which a power-law hub turns quadratic; the
  * fix is to ORIENT every edge from its lower-(degree, id) endpoint to the
  * higher one and enumerate wedges only at each vertex's OUT-neighbors.
  * Every vertex's out-degree is then bounded by O(√m), so wedge volume is
  * O(m^1.5) worst-case and far less on real graphs — the hub stops being
  * the last reducer because its wedges are charged to its (low-degree)
  * neighbors.
  *
  * Scale shape: two node-keyed joins to attach endpoint degrees, one
  * self-join on the wedge center, one edge-keyed join to close wedges —
  * all hash joins on graph keys; no driver collect, no broadcast
  * assumption (Catalyst may still broadcast the degree table when stats
  * allow — correct either way).
  */
object Triangles {

  /** Per-node triangle participation over an undirected simple graph.
    *
    * @param edges canonical edge list: columns `u`, `v` with `u < v`,
    *              no duplicates, no self-loops (caller's contract)
    * @return (node, deg, n_tri, clustering_fp6) for every node with
    *         deg ≥ 2 — local clustering coefficient
    *         `2·n_tri / (deg·(deg−1))` rounded at 1e−6
    */
  def nodeTriangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // attach endpoint degrees, then orient low-(deg, id) → high-(deg, id);
    // ddeg rides along so wedge endpoints can be ordered by the SAME total
    // order the orientation used (otherwise the closing edge lookup misses)
    val withDeg = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"),
      when(fwd, col("dv")).otherwise(col("du")).as("ddeg"))
    // wedges at each center's out-neighborhood (out-degree ≤ O(√m) by the
    // orientation), endpoints canonically ordered by (ddeg, dst)
    val a = oriented.select(col("src"), col("dst").as("w1"), col("ddeg").as("d1"))
    val b = oriented.select(col("src"), col("dst").as("w2"), col("ddeg").as("d2"))
    val wedges = a.join(b, Seq("src"))
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("w1") < col("w2")))
    // a wedge closes iff the oriented edge w1 → w2 exists (w1 precedes w2
    // in the orientation order by construction)
    val tris = wedges.join(
      oriented.select(col("dst").as("w2"), col("src").as("w1")),
      Seq("w1", "w2"), "left_semi")
    val perNode = tris
      .select(explode(array(col("src"), col("w1"), col("w2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.filter(col("deg") >= 2)
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(coalesce(col("n_tri"), lit(0L)).cast("double") * lit(2e6) /
          (col("deg") * (col("deg") - 1))).cast("long").as("clustering_fp6"))
  }
}
