package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming as-of enrichment: dimension versions as keyed state, facts
  * emitted when the watermark makes their lookup final — late-arriving
  * dim updates, equal-time inclusivity, tie-breaks, restart safety, and
  * batch parity with the q56 oracle shape over the real events table.
  */
class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-06-01 10:$min%02d:00")

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def factsDf(rows: Seq[(Long, Timestamp, String)]) =
    rows.toDF("key", "ts", "fact")
  private def dimsDf(rows: Seq[(Long, Timestamp, Long, String)]) =
    rows.toDF("key", "ts", "tie", "dim")

  test("late dim updates, equal-ts inclusivity, ties, no-prior null — " +
      "emitted only once the watermark makes the lookup final; " +
      "restart-safe from the checkpoint") {
    withRocksDb {
      val srcF = tmpDir("asof-facts"); val srcD = tmpDir("asof-dims")
      // file 1: dims d0@0, d10a/d10b@10 (tie 1 vs 2); facts f5@5, f10@10,
      // f15@15 on key 7, f7@7 on dim-less key 8
      factsDf(Seq((7L, ts(5), "f5"), (7L, ts(10), "f10"),
          (7L, ts(15), "f15"), (8L, ts(7), "f7")))
        .coalesce(1).write.mode("overwrite").parquet(srcF)
      dimsDf(Seq((7L, ts(0), 1L, "d0"), (7L, ts(10), 1L, "d10a"),
          (7L, ts(10), 2L, "d10b")))
        .coalesce(1).write.mode("overwrite").parquet(srcD)
      val t0 = System.currentTimeMillis() - 120000
      Seq(srcF, srcD).foreach(d =>
        new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
          .foreach(f => assert(f.setLastModified(t0))))
      // file 2: a LATE dim update d2@2 — delivered after f5 but still
      // within the watermark delay, so f5's final lookup must see it
      dimsDf(Seq((7L, ts(2), 1L, "d2")))
        .coalesce(1).write.mode("append").parquet(srcD)
      val ckpt = tmpDir("asof-ckpt"); val out = tmpDir("asof-out")
      def readSrc(dir: String, ddl: String) = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .option("maxFilesPerTrigger", "1").parquet(dir)
      // per-batch overwrite sink (the winnowIngest pattern): restart-safe
      // and exactly-once by construction — the memory sink cannot recover
      // from a checkpoint
      def start() = AsOfStream.enrichPrior(spark,
          readSrc(srcF, "key LONG, ts TIMESTAMP, fact STRING"),
          readSrc(srcD, "key LONG, ts TIMESTAMP, tie LONG, dim STRING"),
          watermarkDelay = "30 minutes")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/batch=$id"): Unit
        }
        .option("checkpointLocation", ckpt).start()
      def emitted() =
        if (Option(new java.io.File(out).listFiles()).exists(_.nonEmpty))
          spark.read.parquet(out).select(col("key"), col("fact"), col("dim"))
            .as[(Long, String, String)].collect().toSet
        else Set.empty[(Long, String, String)]
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // watermark so far: minute 15 - 30 min < 0 — NOTHING is final yet
      assert(emitted().isEmpty,
        "no fact may be emitted before the watermark passes it")
      // restart from the same checkpoint; the advancer dim pushes the
      // watermark past every fact and fires the buffered timers
      dimsDf(Seq((999L, ts(50), 1L, "adv")))
        .coalesce(1).write.mode("append").parquet(srcD)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = emitted()
      assert(got === Set(
        (7L, "f5", "d2"),     // the late dim won: latest <= minute 5
        (7L, "f10", "d10b"),  // equal-ts dim included, greatest tie wins
        (7L, "f15", "d10b"),
        (8L, "f7", null)),    // no prior dim -> null enrichment
        s"unexpected enrichment: $got")
    }
  }

  test("q56 oracle parity: the streamed delivery reproduces the batch " +
      "as-of join over the real events table") {
    withRocksDb {
      val sf = "/root/testdata/sf0.001"
      val e = graft.core.Tables.events(spark, sf)
      // streamed delivery: the table re-chunked into 4 files, consumed
      // 2 per micro-batch in arbitrary time order; the delay exceeds the
      // table's 30-day span so nothing is ever late, and one advancer row
      // (an unused key far in the future) finalizes every lookup
      val src = tmpDir("asof-events-src")
      e.select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .repartition(4).write.mode("overwrite").parquet(src)
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "event_id LONG, user_id LONG, ts TIMESTAMP, event_type STRING"))
        .option("maxFilesPerTrigger", "2").parquet(src)
      val facts = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").cast("string").as("fact"))
      val dims = stream.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("tie"),
          to_json(struct(col("event_id"), col("event_type"))).as("dim"))
      val q = AsOfStream.enrichPrior(spark, facts, dims,
          watermarkDelay = "40 days")
        .writeStream.format("memory").queryName("asof_events")
        .option("checkpointLocation", tmpDir("asof-events-ckpt"))
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val maxTs = e.agg(max(col("ts"))).head().getTimestamp(0)
        Seq((999999L, new Timestamp(maxTs.getTime + 41L * 24 * 3600 * 1000),
            "advancer", -1L))
          .toDF("event_id", "ts", "event_type", "tie")
          .select(col("event_id"), lit(999999L).as("user_id"), col("ts"),
            col("event_type"))
          .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("asof_events")
        .select(col("fact").cast("long").as("event_id"),
          col("key").as("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          get_json_object(col("dim"), "$.event_id").cast("long").as("prior_id"),
          get_json_object(col("dim"), "$.event_type").as("prior_type"))
        .as[(Long, Long, String, Option[Long], Option[String])]
        .collect().toSet
      val expected = graft.queries.AsOfQueries.q31AsofJoin(spark, sf)
        .as[(Long, Long, String, Option[Long], Option[String])]
        .collect().toSet
      assert(got.size === expected.size && got === expected,
        s"streamed as-of diverged from the batch join " +
          s"(got ${got.size}, expected ${expected.size})")
    }
  }

  test("dims-ONLY key compacts without any fact: state stays at one " +
      "survivor, and a later fact is served by it") {
    withRocksDb {
      // key 7 receives FIVE dim versions and no fact; key 99's facts
      // drive the watermark past them. Before r19, timers existed only
      // per fact, so key 7's prefix could never compact — the dim-arrival
      // compaction timer (plus compaction on no-ripe firings, the r18
      // advice) is what this pins via the state-store row count.
      val srcF = tmpDir("asof-dimonly-facts"); val srcD = tmpDir("asof-dimonly-dims")
      factsDf(Seq((99L, ts(30), "w30")))
        .coalesce(1).write.mode("overwrite").parquet(srcF)
      dimsDf((0 until 5).map(i => (7L, ts(i), 1L, s"d$i")) :+
          (99L, ts(29), 1L, "k99d"))
        .coalesce(1).write.mode("overwrite").parquet(srcD)
      val t0 = System.currentTimeMillis() - 120000
      Seq(srcF, srcD).foreach(d =>
        new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
          .foreach(f => assert(f.setLastModified(t0))))
      // second fact file: wm reaches minute 60 - 20 = 40 > every key-7 dim
      factsDf(Seq((99L, ts(60), "w60")))
        .coalesce(1).write.mode("append").parquet(srcF)
      new java.io.File(srcF).listFiles().filter(_.getName.endsWith(".parquet"))
        .filter(_.lastModified() > t0).foreach(f => assert(f.setLastModified(t0 + 30000)))
      val ckpt = tmpDir("asof-dimonly-ckpt"); val out = tmpDir("asof-dimonly-out")
      def readSrc(dir: String, ddl: String) = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .option("maxFilesPerTrigger", "1").parquet(dir)
      def start() = AsOfStream.enrichPrior(spark,
          readSrc(srcF, "key LONG, ts TIMESTAMP, fact STRING"),
          readSrc(srcD, "key LONG, ts TIMESTAMP, tie LONG, dim STRING"),
          watermarkDelay = "20 minutes")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/batch=$id"): Unit
        }
        .option("checkpointLocation", ckpt).start()
      val q1 = start()
      val finalState =
        try {
          q1.processAllAvailable()
          q1.recentProgress.flatMap(_.stateOperators)
            .map(_.numRowsTotal).lastOption.getOrElse(-1L)
        } finally q1.stop()
      // post-compaction state: key 7 = ONE survivor (d4), key 99 = one
      // survivor + the still-pending w60 fact ≈ 3 rows. The pre-r19 code
      // keeps all five key-7 versions (≈ 7 rows) — the bound separates
      // the regimes with margin for store-internal accounting.
      assert(finalState >= 0 && finalState <= 4,
        s"dims-only key did not compact: $finalState state rows")
      // continuation from the checkpoint: a key-7 fact arrives and must
      // be served by the compacted survivor — compaction is invisible to
      // semantics
      factsDf(Seq((7L, ts(45), "f45"), (99L, ts(99), "flush")))
        .coalesce(1).write.mode("append").parquet(srcF)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = spark.read.parquet(out)
        .select(col("key"), col("fact"), col("dim"))
        .as[(Long, String, String)].collect().toSet
      assert(got.contains((7L, "f45", "d4")),
        s"fact not served by the compacted survivor: $got")
    }
  }
}
