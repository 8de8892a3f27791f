package graft.tools

import graft.core.GraftSession
import graft.queries.Registry

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/tmp/graft_sf1")
    val names = sys.env.getOrElse("SCRATCH_QUERIES",
      "q24_minhash_lsh,q21_embed_neardup,q62_dedup_groups,q68_incremental_dedup,q73_auto_neardup").split(",")
    val spark = GraftSession.local("scratch", 32)
    names.foreach { n =>
      val g = Registry.byName(n.trim)
      def run(): Double = {
        val t0 = System.nanoTime()
        g.df(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      spark.catalog.clearCache()
      val a = run()
      spark.catalog.clearCache()
      val b = run()
      println(f"FOCUS ${g.name}%-26s ${math.min(a, b)}%8.3f s")
    }
    spark.stop()
  }
}
