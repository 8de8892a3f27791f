package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Streaming novelty-monitor throughput smoke (dev tool): stages a
  * synthetic corpus as one parquet file per micro-batch — each batch 50%
  * repeats of earlier content, 50% fresh — and streams it through
  * [[graft.streaming.NoveltyStream.noveltyStats]]. Prints sustained
  * docs/s, per-batch trigger times, and the measured novelty fractions —
  * evidence that (a) per-batch cost tracks batch size (Bloom state is a
  * fixed byte budget, never per-gram rows), and (b) the monitor actually
  * reads ~0.5 novelty on half-repeat batches. Run at two sizes:
  * `sbt "runMain graft.tools.NoveltySmoke 20000"` vs `... 60000`.
  */
object NoveltySmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("graft-novelty-smoke", 32)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = s"/tmp/graft_novelty_smoke/$nDocs"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val stage = s"$base/stage"
    def textOf(seed: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 60).map(i =>
        concat(lit("w"), pmod(xxhash64(seed * 1000 + i), lit(500000)))): _*)
    val perBatch = nDocs / batches
    (0 until batches).foreach { b =>
      // even doc_id → fresh text keyed by own id; odd → repeat of the
      // PREVIOUS batch's content (batch 0: repeats inside itself)
      val prevBase = greatest(col("doc_id") - perBatch, col("doc_id") % perBatch)
      spark.range(b.toLong * perBatch, (b + 1).toLong * perBatch)
        .select(col("id").as("doc_id"))
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-06-01 10:00:00")))
        .withColumn("text",
          when(pmod(col("doc_id"), lit(2)) === 1,
            textOf(prevBase - (prevBase % 2))).otherwise(textOf(col("doc_id"))))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(stage)
    }
    // Bloom budget must track expected gram cardinality or the filter
    // saturates and novelty under-reads (measured: 200k docs into the
    // 2^20 demo budget reads 0.09 instead of ~0.5); 3rd arg overrides —
    // size ~8-16 bits per expected distinct gram
    val bloomBits = args.drop(2).headOption.map(_.toInt).getOrElse(1 << 20)
    val docs = spark.readStream
      .schema("doc_id LONG, ts TIMESTAMP, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val t0 = System.nanoTime()
    val q = graft.streaming.NoveltyStream
      .noveltyStats(spark, docs, nShards = 64, bits = bloomBits)
      .writeStream.format("memory").queryName("novelty_smoke")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    val dt = (System.nanoTime() - t0) / 1e9
    val trig = q.recentProgress.toSeq
      .map(p => p.durationMs.getOrDefault("triggerExecution", 0L))
      .filter(_ > 0)
    q.stop()
    val r = spark.table("novelty_smoke")
      .agg(sum(col("n_grams")), sum(col("n_new"))).collect().head
    // flatness evidence: Bloom state is a fixed byte budget, so per-batch
    // cost must not grow as the filter fills — equal halves prove it
    def mean(xs: Seq[java.lang.Long]) = if (xs.isEmpty) 0.0 else xs.map(_.longValue).sum.toDouble / xs.size
    val (h1, h2) = trig.splitAt(trig.length / 2)
    println(f"SMOKE novelty nDocs=$nDocs batches=$batches wall=$dt%.1f s " +
      f"rate=${nDocs / dt}%.0f docs/s grams=${r.getLong(0)} new=${r.getLong(1)} " +
      f"novelty=${r.getLong(1).toDouble / r.getLong(0)}%.3f " +
      f"firstHalfMs=${mean(h1)}%.0f secondHalfMs=${mean(h2)}%.0f " +
      s"perBatchMs=${trig.mkString(",")}")
    spark.stop()
  }
}
