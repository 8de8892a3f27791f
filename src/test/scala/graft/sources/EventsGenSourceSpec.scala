package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom DSv2 micro-batch stream ([[EventsGenSource]]): batch/stream
  * parity, distributed range generation, and checkpoint-resume without
  * replaying committed batches.
  */
class EventsGenSourceSpec extends SparkSpec {

  private def batchDf(total: Long) = spark.read
    .format("graft-events-gen")
    .option("total_rows", total).option("partitions", 3)
    .load()

  test("batch scan: deterministic, range-partitioned, correct shape") {
    val df = batchDf(2000)
    assert(df.schema.fieldNames.toSeq ===
      Seq("event_id", "user_id", "ts", "event_type", "amount"))
    assert(df.count() === 2000)
    assert(df.select(countDistinct(col("event_id"))).head.getLong(0) === 2000)
    // pure function of (seed, index): two scans are row-identical
    assert(df.orderBy("event_id").collect() ===
      batchDf(2000).orderBy("event_id").collect())
    // the scan parallelizes: one task per requested range
    assert(df.rdd.getNumPartitions === 3)
    val types = df.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === EventsGenSource.eventTypes.toSet)
  }

  test("stream equals batch and resumes from checkpoint without replay") {
    val ckpt = tmpDir("egen-ckpt")
    val seen = mutable.Buffer[Row]()
    val batchSizes = mutable.Buffer[Long]()
    def start() = spark.readStream
      .format("graft-events-gen")
      .option("rows_per_batch", 300).option("total_rows", 1500)
      .option("partitions", 3)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
        seen.synchronized { seen ++= rows; batchSizes += rows.length.toLong }
        ()
      }
      .start()

    // phase 1: let at least one batch commit, then stop mid-stream
    val q1 = start()
    val deadline = System.currentTimeMillis() + 30000
    while (seen.synchronized(seen.size) < 300 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q1.stop()
    val afterPhase1 = seen.synchronized(seen.size)
    assert(afterPhase1 >= 300, s"no batch completed, got $afterPhase1")

    // phase 2: restart from the checkpoint and drain to total_rows
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // every generated row arrived (no gaps), and the restart resumed from
    // the committed offset: at MOST the one batch in flight at stop() may
    // replay (foreachBatch is at-least-once at a stop/crash boundary —
    // exactly-once needs an idempotent sink, which is EventsStream's job),
    // never a replay from zero
    val all = seen.synchronized(seen.toVector)
    assert(all.map(_.getLong(0)).distinct.size === 1500)
    assert(all.size - 1500 <= 300, s"replayed more than one batch: ${all.size}")
    assert(batchSizes.forall(_ <= 300), batchSizes.mkString(","))
    val streamed = all.distinctBy(_.getLong(0)).sortBy(_.getLong(0))
    val batch = batchDf(1500).orderBy("event_id").collect().toVector
    assert(streamed === batch)
  }

  test("Trigger.AvailableNow drains exactly total_rows and terminates") {
    // the production batch-drain mode: the engine wraps the paced source,
    // snapshots availability, runs it down in micro-batches, then STOPS on
    // its own (no processAllAvailable/stop choreography)
    val q = spark.readStream
      .format("graft-events-gen")
      .option("rows_per_batch", 400).option("total_rows", 1200)
      .load()
      .writeStream
      .format("memory").queryName("egen_avail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    val got = spark.table("egen_avail")
    assert(got.count() === 1200)
    assert(got.select(countDistinct(col("event_id"))).head.getLong(0) === 1200)
  }

  test("stream supports event-time windowed aggregation with a watermark") {
    val agg = spark.readStream
      .format("graft-events-gen")
      .option("rows_per_batch", 500).option("total_rows", 1000)
      .load()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory").queryName("egen_windows")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    // 1000 rows at 1 s spacing = ~16.7 min of event time; appended
    // (watermark-closed) windows must hold full 5-min × type counts
    val out = spark.table("egen_windows")
    val closed = out.agg(sum(col("n"))).head.getLong(0)
    assert(out.count() > 0)
    assert(closed > 0 && closed <= 1000)
  }

  test("invalid pacing options fail at build, not as a silently idle stream") {
    // rows_per_batch <= 0 would make every latestOffset == start forever
    val e = intercept[Exception] {
      spark.read.format("graft-events-gen")
        .option("total_rows", 100).option("rows_per_batch", 0)
        .load().count()
    }
    assert(e.getMessage.contains("rows_per_batch"))
  }
}
