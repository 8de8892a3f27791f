package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.queries.CurationQuery

/** Ad-hoc stage profiler (dev tool, not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    noop(Tables.documents(spark, dir))
    time("q47 cold")(noop(CurationQuery.q47Curation(spark, dir)))
    time("q47 warm")(noop(CurationQuery.q47Curation(spark, dir)))
    time("q47 warm2")(noop(CurationQuery.q47Curation(spark, dir)))
    spark.stop()
  }
}
