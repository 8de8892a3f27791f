package graft.tools

import graft.core.GraftSession
import graft.queries.Registry

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch <gate>[,<gate>...]"`, discard.
  * Durable scale evidence belongs in ScaleSmoke / SCALING notes, not
  * here.
  *
  * Current contents: per-job wall-time breakdown (job id, wall seconds,
  * last-stage callsite) of any registry gate — which barriers /
  * AQE-materialized stages actually cost time, before touching any of
  * them. Per-gate: one warm run (discarded) then two measured runs.
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
          j.stageInfos.lastOption.map(_.name).getOrElse("")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = starts.getOrDefault(j.jobId, (0L, ""))
        jobs ::= ((j.jobId, System.nanoTime() - t0, d))
      }
    })
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("q244_curation_pipeline"))
    val gates = names.map(n => Registry.all.find(_.name == n)
      .getOrElse(sys.error(s"unknown gate: $n")))
    gates.foreach { g =>
      def once(tag: String, detail: Boolean): Unit = {
        spark.catalog.clearCache()
        jobs = Nil
        val t0 = System.nanoTime()
        g.df(spark, sfDir).write.mode("overwrite").format("noop").save()
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let the listener bus drain
        val jobSum = jobs.map(_._2).sum / 1e9
        println(f"${g.name} $tag total=$total%.3f jobs=${jobs.size} jobSum=$jobSum%.3f gap=${total - jobSum}%.3f")
        if (detail) jobs.sortBy(_._1).foreach { case (id, ns, d) =>
          println(f"  job $id%3d ${ns / 1e9}%7.3f  ${d.take(90)}")
        }
      }
      once("warm", detail = false)
      once("run1", detail = false)
      once("run2", detail = true)
    }
    spark.stop()
  }
}
