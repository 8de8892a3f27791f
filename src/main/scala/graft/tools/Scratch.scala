package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in [[ScaleSmoke]]; durable assertions belong in specs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    val dir = "/root/testdata/sf0.1"

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import org.apache.spark.scheduler._
    import scala.collection.mutable
    val stages = mutable.ArrayBuffer[(Int, Double, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        for (a <- i.submissionTime; b <- i.completionTime)
          stages += ((i.stageId, (b - a) / 1e3, i.numTasks,
            i.taskMetrics.executorRunTime))
      }
    })

    def profile(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      noop(df); spark.catalog.clearCache(); Thread.sleep(300)
      stages.clear()
      val t0 = System.nanoTime()
      noop(df)
      println(f"TOTAL $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(300)
      stages.sortBy(-_._2).take(12).foreach { case (id, s, n, rt) =>
        println(f"STG $id%3d wall=$s%6.2f s tasks=$n%-3d cpuSum=${rt / 1e3}%6.2f s") }
      spark.catalog.clearCache()
    }
    profile("q24", graft.queries.DedupQueries.q24MinhashLsh(spark, dir))
    profile("q47", graft.queries.CurationQuery.q47Curation(spark, dir))
    spark.stop()
  }
}
