package graft.tools

import org.apache.spark.sql.functions._
import graft.core.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch", 32)
    val vecs = spark.read.parquet("/tmp/graft_scale/vecs")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    noop(vecs)
    // signature projection only, via the private path: emulate with public lshNearDupLosersMinRep pieces
    val m = classOf[graft.ops.Similarity.type]
    // public emulation: planes+signature are private; rebuild equivalent expression here
    val md = java.security.MessageDigest.getInstance("MD5")
    val ps = Seq.tabulate(16)(t => Seq.tabulate(9)(b => Array.tabulate(64) { d =>
      val dg = md.digest(s"hp:$t:$b:$d".getBytes("UTF-8"))
      if (((dg(0) >> 4) & 1) == 1) 1f else -1f
    }))
    def sig(tp: Seq[Array[Float]]) = tp.zipWithIndex.map { case (p, i) =>
      when(graft.functions.VectorFunctions.dot_f(col("vec"), typedlit(p.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sigs = vecs.select(col("id"), posexplode(array(ps.map(sig): _*)).as(Seq("table", "sig")))
    time("signatures only")(noop(sigs))
    time("signatures again")(noop(sigs))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("table"), col("sig"))
    val cand = sigs.withColumn("min_id", min(col("id")).over(w))
      .filter(col("id") =!= col("min_id")).select(col("id"), col("min_id")).distinct()
    time("cand (window+distinct)")(noop(cand))
    spark.stop()
  }
}
