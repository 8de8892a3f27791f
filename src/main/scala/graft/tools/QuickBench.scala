package graft.tools

import graft.core.GraftSession
import graft.queries.Registry

/** Targeted bench (dev tool): times only the queries named in `args`
  * (median of 3 after one warm-up), on `SPARK_GRAFT_SF_DIR`. For chasing
  * a single query's regression without paying the full 91-query pass.
  * Durable numbers still come from `graft.Bench`.
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tunedLocal("graft-quickbench", sfDir, 32)
    val wanted = args.toSet
    val gs = Registry.all.filter(g => wanted.isEmpty || wanted.contains(g.name))
    def run(g: graft.queries.Gated): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      g.df(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    gs.foreach { g => try run(g) catch { case e: Throwable => println(s"WARM ${g.name} FAILED: $e") } }
    gs.foreach { g =>
      val ts = (1 to 3).map(_ => run(g)).sorted
      println(f"QUICK ${g.name}%-28s median=${ts(1)}%7.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
