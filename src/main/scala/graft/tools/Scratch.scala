package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in [[ScaleSmoke]]; durable assertions belong in specs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    val dir = "/root/testdata/sf0.1"
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the session (codegen, shuffle machinery)
    spark.read.parquet(s"$dir/documents.parquet").count()
    t("q47 cold") {
      graft.queries.CurationQuery.q47Curation(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("q47 warm") {
      graft.queries.CurationQuery.q47Curation(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("q24 warm") {
      graft.queries.DedupQueries.q24MinhashLsh(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("q17 warm (noise check)") {
      graft.queries.TextQueries.q17TokenJaccard(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
