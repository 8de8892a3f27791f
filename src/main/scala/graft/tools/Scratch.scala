package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here.
  *
  * Current contents: the PageRank lineage-depth profile — wall time of
  * N-round pageRank on the q215-shaped kNN graph at sf0.001, with the
  * default every-4th-round localCheckpoint barrier vs. unbarriered
  * (`barrierEvery = Int.MaxValue`) — the evidence behind the barrier
  * cadence note in Graphs.pageRank, and a mass check that the barrier
  * changes no values. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    val dir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val edges = graft.ops.Similarity.knnGraphLsh(vecs, k = 5)
      .select(col("id").as("src"), col("neighbor_id").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count()
    val nodes = Tables.embeddings(spark, dir).select(col("vec_id").as("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    for (iters <- Seq(3, 8, 12);
         (tag, every) <- Seq("barrier4" -> 4, "none" -> Int.MaxValue)) {
      val t0 = System.nanoTime()
      val s = graft.ops.Graphs.pageRank(edges, nodes, iters, every)
        .agg(sum(col("score"))).head().getLong(0)
      println(f"SCRATCH pagerank iters=$iters%2d barrier=$tag%-8s mass=$s " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
