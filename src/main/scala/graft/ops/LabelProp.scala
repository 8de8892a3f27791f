package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous weighted label propagation (Raghavan et al. 2007) —
  * community detection over an edge list: every node starts in its own
  * community and repeatedly adopts the label carrying the highest
  * incident edge-weight among its neighbours. Fixed iteration count and a
  * deterministic tie-break (min label) make the result engine-portable —
  * the async/randomized variant of the paper trades that for faster
  * convergence, which an oracle-gated pipeline cannot accept.
  *
  * Scale shape: per iteration, one join (labels ⋈ edges on the neighbour
  * key) + one (node, label) aggregate + one rank-1 window that compiles
  * to `WindowGroupLimit` (≤1 row per node per partition pre-exchange).
  * The edge table is persisted once and reused every round — the
  * [[TextRank]] PageRank-loop discipline; labels stay (node, label)
  * narrow. Work per round is O(|E|), rounds are fixed — never a
  * convergence loop whose tail wags the job.
  */
object LabelProp {

  /** @param edges DIRECTED edge list (src, dst, w) — pass both directions
    *              for an undirected graph; weights integral (exact
    *              cross-engine argmax)
    * @param nodes one column `node`; isolated nodes keep their own label
    * @return (node, label) after `iters` synchronous rounds
    */
  def propagate(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
      val wArg = Window.partitionBy(col("node"))
        .orderBy(col("wsum").desc, col("label"))
      val best = e
        .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("node"), col("label"))
        .agg(sum(col("w")).as("wsum"))
        .withColumn("rn", row_number().over(wArg))
        .filter(col("rn") === 1)
        .select(col("node"), col("label").as("new_label"))
      labels = labels
        .join(best, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
    }
    labels
  }
}
