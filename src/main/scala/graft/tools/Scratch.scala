package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in [[ScaleSmoke]]; durable assertions belong in specs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val df = graft.queries.Relational.q8RollingMean(spark, dir)
    df.write.format("noop").mode("overwrite").save() // warm
    t("q8 warm 1")(df.write.format("noop").mode("overwrite").save())
    t("q8 warm 2")(graft.queries.Relational.q8RollingMean(spark, dir)
      .write.format("noop").mode("overwrite").save())
    val p = df.queryExecution.executedPlan.toString
    println("EXCHANGES " + "Exchange".r.findAllIn(p).length +
      " SORTS " + "Sort ".r.findAllIn(p).length)
    spark.stop()
  }
}
