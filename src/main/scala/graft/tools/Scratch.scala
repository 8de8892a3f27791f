package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tunedLocal("scratch", dir, 32)
    val docs = graft.core.Tables.documents(spark, dir)
    def run(mode: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.ops.TextRank.textRankKeywords(docs, "doc_id", "text", 20, 5, mode)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run("broadcast"); run("partitioned") // warm
    val results = (1 to 3).flatMap { _ =>
      Seq("broadcast" -> run("broadcast"), "partitioned" -> run("partitioned"))
    }
    results.groupBy(_._1).foreach { case (m, ts) =>
      println(f"SCRATCH $m%-12s median=${ts.map(_._2).sorted.apply(1)}%.3f runs=${ts.map(t => f"${t._2}%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
