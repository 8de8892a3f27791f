package graft.tools

import graft.core.GraftSession

/** Ad-hoc profiling scratchpad (dev tool, intentionally minimal): edit,
  * `sbt "runMain graft.tools.Scratch"`, discard. Durable scale evidence
  * belongs in ScaleSmoke / SCALING notes, not here. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tunedLocal("scratch", dir, 32)
    val g = graft.queries.Registry.byName("q74_fast_agreement")
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    for (i <- 1 to 6) {
      spark.catalog.clearCache()
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      g.df(spark, dir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH run=$i t=$dt%7.3f s gc=${gcMillis - gc0} ms")
    }
    spark.stop()
  }
}
