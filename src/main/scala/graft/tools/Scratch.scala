package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.ops._

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

    val docs = Tables.documents(spark, dir)
    noop(docs) // warm scan
    val exact = Dedup.exact(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("exact+cache build")(noop(exact))
    time("cache re-read")(noop(exact))
    val sigs = Dedup.minhashSignatures(exact, "doc_id", "text")
    time("sigs only")(noop(sigs))
    time("sigs only again")(noop(sigs))
    val cand = Dedup.minhashCandidates(exact, "doc_id", "text")
    time("cand (sigs+join+groupBy)")(noop(cand))
    val sh = exact.select(col("doc_id").as("id"),
      graft.functions.TextFunctions.distinct_shingles(col("text"), 3).as("sh"))
    time("shingle sets only")(noop(sh))
    val confirmed = Dedup.verifyJaccard(exact, cand.select("id_a", "id_b"), "doc_id", "text")
    time("verifyJaccard")(noop(confirmed))
    spark.stop()
  }
}
