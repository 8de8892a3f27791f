package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here. */
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.local("scratch", 32)
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      val v = graft.core.Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val n = v.count()
      val k = graft.ops.Similarity.autoK(n)
      val path = java.nio.file.Files.createTempDirectory("scratch_cents").toString + "/c"
      val cents = graft.ops.Similarity.centroidCodebook(v, path, k, 2, "sample")
      val sorted = cents.sortBy(_._1)
      val asg = v.select(col("id"),
        graft.functions.VectorFunctions.nearest_centroids(col("vec"),
          sorted.map(_._2.toArray), sorted.map(_._1), 1).getItem(0).as("cid"))
      val sizes = asg.groupBy("cid").count().select(col("count")).collect().map(_.getLong(0))
      val pairs = sizes.map(c => c * (c - 1) / 2).sum
      println(s"SCRATCH dir=$dir n=$n k=$k maxCluster=${sizes.max} pairs=$pairs pairsPerRow=${pairs.toDouble / n}")
    }
    spark.stop()
  }
}
