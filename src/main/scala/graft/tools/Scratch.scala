package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in [[ScaleSmoke]]; durable assertions belong in specs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("q59_repetition", "q60_token_novelty", "q61_asof_tvf")) {
      val df = graft.queries.Registry.byName(n).df(spark, dir)
      println(s"=== $n rows=${df.count()}")
      df.show(5, truncate = false)
    }
    spark.stop()
  }
}
