package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Streaming dedup-ingest throughput smoke (dev tool; VERDICT r9 #6):
  * stages a synthetic corpus as one parquet file per micro-batch, streams
  * it through [[graft.streaming.DocStream.dedupIngest]] (exactly-once
  * MinHash index ingest), and prints sustained docs/s plus the per-batch
  * trigger times and final index/admitted state — the evidence that
  * per-batch cost tracks BATCH size (bounded state, no corpus re-scan),
  * not corpus size. Run at two sizes and compare:
  * `sbt "runMain graft.tools.IngestSmoke 20000"` vs `... 60000`.
  */
object IngestSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("graft-ingest-smoke", 32)
    import spark.implicits._
    val base = s"/tmp/graft_ingest_smoke/$nDocs"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val stage = s"$base/stage"
    // 5% exact dups + 5% near-dups (the ScaleSmoke corpus shape), staged
    // as ONE file per micro-batch so maxFilesPerTrigger=1 gives exactly
    // `batches` triggers
    def baseText(idCol: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 60).map(i =>
        concat(lit("w"), pmod(xxhash64(idCol * 1000 + i), lit(5000)))): _*)
    val perBatch = nDocs / batches
    (0 until batches).foreach { b =>
      val clusterBase = col("doc_id") - (col("doc_id") % 20)
      spark.range(b.toLong * perBatch, (b + 1).toLong * perBatch)
        .select(col("id").as("doc_id"))
        .withColumn("text",
          when(pmod(col("doc_id"), lit(20)) === 7, baseText(clusterBase))
            .when(pmod(col("doc_id"), lit(20)) === 13,
              concat(baseText(clusterBase), lit(" extraTok")))
            .otherwise(baseText(col("doc_id"))))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(stage)
    }
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val t0 = System.nanoTime()
    val q = graft.streaming.DocStream.dedupIngest(docs,
      s"$base/index", s"$base/admitted", s"$base/ckpt", fast = true)
    q.processAllAvailable()
    val dt = (System.nanoTime() - t0) / 1e9
    val trig = q.recentProgress.toSeq
      .map(p => p.durationMs.getOrDefault("triggerExecution", 0L))
      .filter(_ > 0)
    q.stop()
    val admitted = spark.read.parquet(s"$base/admitted").count()
    val idxRows = graft.ops.Dedup.readSignatureIndex(spark, s"$base/index").count()
    // flatness evidence: the index grows ~linearly across the run, so if
    // per-batch cost tracked INDEX size (a rescan bug) the second half
    // would run ~2-3x the first; equal halves = cost tracks batch size
    def mean(xs: Seq[java.lang.Long]) = if (xs.isEmpty) 0.0 else xs.map(_.longValue).sum.toDouble / xs.size
    val (h1, h2) = trig.splitAt(trig.length / 2)
    println(f"SMOKE ingest nDocs=$nDocs batches=$batches wall=$dt%.1f s " +
      f"rate=${nDocs / dt}%.0f docs/s admitted=$admitted indexRows=$idxRows " +
      f"firstHalfMs=${mean(h1)}%.0f secondHalfMs=${mean(h2)}%.0f " +
      s"perBatchMs=${trig.mkString(",")}")
    spark.stop()
  }
}
