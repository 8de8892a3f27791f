package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.tunedLocal("scratch", dir, 32)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?").take(60)))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobs.remove(j.jobId)
        if (s != null) done.add((j.jobId, System.nanoTime() - s._1, s._2))
      }
    })
    val g = graft.queries.Registry.byName("q74_fast_agreement")
    for (i <- 1 to 8) {
      spark.catalog.clearCache()
      done.clear()
      val t0 = System.nanoTime()
      g.df(spark, dir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val slow = {
        import scala.jdk.CollectionConverters._
        done.asScala.toSeq.sortBy(-_._2).take(3)
          .map(j => f"job${j._1}:${j._2 / 1e9}%.2f").mkString(" ")
      }
      println(f"SCRATCH run=$i t=$dt%6.2f s slowest: $slow")
    }
    spark.stop()
  }
}
