package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here. */
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.local("scratch", 32)
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      if (new java.io.File(dir).exists()) {
        val v = graft.core.Tables.embeddings(spark, dir)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val n = v.count()
        val k = graft.ops.Similarity.autoK(n)
        val path = java.nio.file.Files.createTempDirectory("scratch_cents").toString + "/c"
        val cents = graft.ops.Similarity.centroidCodebook(v, path, k, 2, "sample")
        val asg = graft.ops.Similarity.assign(v, cents.toSeq.toDF("cid", "cvec"))
        val sizes = asg.groupBy("cid").count().agg(
          max("count").as("max"), avg("count").as("avg")).head
        println(s"SCRATCH dir=$dir n=$n k=$k maxCluster=${sizes.getLong(0)} avgCluster=${sizes.getDouble(1)}")
      }
    }
    spark.stop()
  }
}
