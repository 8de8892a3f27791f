package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here.
  *
  * Current contents: per-job wall-time breakdown of the q244 curation
  * pipeline — which of the stage barriers (persist+count,
  * localCheckpoint) actually costs time, before touching any of them.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tunedLocal("scratch", sfDir, 32)
    val sc = spark.sparkContext
    @volatile var jobs = List.empty[(Int, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("spark.job.description", ""))
            .getOrElse("")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = starts.getOrDefault(j.jobId, (0L, ""))
        jobs ::= ((j.jobId, System.nanoTime() - t0, d))
      }
    })
    def once(tag: String): Unit = {
      spark.catalog.clearCache()
      jobs = Nil
      val t0 = System.nanoTime()
      graft.queries.MixQueries.q244CurationPipeline(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the listener bus drain
      println(f"Q244 $tag total=$total%.3f jobs=${jobs.size}")
      jobs.sortBy(_._1).foreach { case (id, ns, d) =>
        println(f"  job $id%3d ${ns / 1e9}%7.3f  ${d.take(80)}")
      }
    }
    once("warm")
    once("run1")
    once("run2")
    spark.stop()
  }
}
