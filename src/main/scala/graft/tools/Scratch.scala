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
    def run(q: String): Unit =
      graft.queries.Registry.byName(q).df(spark, dir)
        .write.format("noop").mode("overwrite").save()
    run("q57_scd2_pit"); run("q58_approx_bounds")
    t("q57 warm")(run("q57_scd2_pit"))
    t("q58 warm")(run("q58_approx_bounds"))
    spark.stop()
  }
}
