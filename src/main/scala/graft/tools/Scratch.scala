package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here. */
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.local("scratch", 32)
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      if (new java.io.File(dir).exists()) {
        val v = graft.core.Tables.embeddings(spark, dir)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val n = v.count()
        val k = graft.ops.Similarity.autoK(n)
        val path = java.nio.file.Files.createTempDirectory("scratch_cents").toString + "/c"
        val cents = graft.ops.Similarity.centroidCodebook(v, path, k, 2, "sample")
        val sorted = cents.sortBy(_._1)
        val matrix = sorted.map(_._2.toArray)
        val ids = sorted.map(_._1)
        val asg = v.select(col("id"),
          graft.functions.VectorFunctions.nearest_centroids(col("vec"), matrix, ids, 1)
            .getItem(0).as("cid"))
        val top = asg.groupBy("cid").count().orderBy(col("count").desc)
          .limit(5).collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
        println(s"SCRATCH dir=$dir n=$n k=$k top5=$top")
      }
    }
    spark.stop()
  }
}
