package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.warehouse.Scd0

/** Structured Streaming over the `events` stream (SURVEY §2.9): the
  * reference's incremental contract mapped onto real streaming primitives —
  * watermarks for late data, event-time windows for aggregation,
  * `foreachBatch` + SCD-0 merge for the effectively-once idempotent sink,
  * and `flatMapGroupsWithState` for custom per-key state (the streaming
  * generalization of the reference's per-ticker watermark file).
  */
object EventsStream {

  /** Typed event row for the stateful operator (top-level: encoder
    * derivation doesn't work for method-local case classes). */
  case class E(event_id: Long, user_id: Long, value: Double)

  /** Typed row for [[attributionTws]] (µs event time). */
  case class AE(event_id: Long, user_id: Long, event_type: String, us: Long)

  /** 7-day attribution lookback in µs — shared with the batch gate
    * (`queries/Events.q146Attribution`) so the two surfaces cannot
    * drift. */
  val AttributionLookbackUs: Long = 7L * 86400L * 1000000L

  /** Event schema as the file stream source expects it (ts in µs). */
  val schema: StructType = StructType.fromDDL(
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** File-based stream source: picks up parquet files dropped into `dir`.
    * `maxFilesPerTrigger=1` makes batch boundaries deterministic in tests. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Tumbling 1-hour counts per event type with a 2-hour watermark: late
    * events beyond the watermark are dropped, windows finalize and emit
    * once (append mode). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Hopping 6-hour/3-hour counts per event type (streaming form of the
    * batch q129 gate — the identical `window()` expression): each event
    * contributes to duration/slide = 2 overlapping windows; the 2-hour
    * watermark finalizes a window once event time passes its end. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Session windows per user (30-minute gap), streaming form of the batch
    * q15 gate query. */
  def sessionized(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("session_value"))

  /** Idempotent warehouse sink: every micro-batch goes through the SCD-0
    * anti-join merge keyed on event_id, so replays/overlaps never double-
    * insert — the reference's at-least-once + idempotent-sink contract
    * (`main.py:14-16` + `DB_manager.py:157-177`) in streaming form. */
  def scd0Sink(events: DataFrame, warehousePath: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Scd0.mergeAppend(batch, warehousePath, "event_id"): Unit
      }
      .start()

  /** Streaming exact dedup: at-least-once sources deliver duplicates; this
    * drops repeats of the same event_id with state bounded by the
    * watermark (the streaming form of the batch `Dedup.exact`). */
  def deduped(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to the same user's
    * view events from the preceding hour. Watermarks on both sides bound
    * the join state (Spark drops buffered rows older than watermark −
    * interval), which is what makes a stream-stream join runnable
    * indefinitely at scale. */
  def purchaseViewJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
      expr("""v_user = user_id AND
              v_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"""))
      .select(col("p_id"), col("user_id"), col("p_ts"), col("v_id"), col("v_ts"))
  }

  /** Custom keyed state: running per-user totals emitted on every update —
    * `flatMapGroupsWithState` with explicit state, the primitive behind
    * everything the built-in windows can't express. Kept as the
    * cross-check of the Spark 4 [[runningTotalsTws]] form (spec asserts
    * batch-for-batch parity). */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.selectExpr("event_id", "user_id", "value").as[E]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[E], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          val batch = rows.toSeq
          val n = n0 + batch.size
          val v = v0 + batch.map(_.value).sum
          state.update((n, v))
          Iterator((user, n, v))
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** [[runningTotals]] on the Spark 4 `transformWithState` API — the
    * forward-compatible stateful surface (named state variables with
    * per-state TTL, timers, and schema evolution, none of which
    * `flatMapGroupsWithState`'s single opaque state value offers).
    * Semantics here are identical to [[runningTotals]]; the win is the
    * operator model: [[RunningTotalsProcessor]] could add a second state
    * variable or a cleanup timer without touching the stored totals.
    *
    * Requires the RocksDB state store
    * (`spark.sql.streaming.stateStore.providerClass =
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`)
    * — the only provider backing transformWithState, set BEFORE the query
    * starts; the HDFS-backed default throws at plan time. */
  /** Streaming last-touch attribution — the q146 batch semantics as a
    * `transformWithState` operator ([[AttributionProcessor]]): per-user
    * keyed state holds only TWO timestamps (latest click, latest view),
    * so state is O(users) regardless of event volume, and every purchase is
    * attributed the moment it arrives. Spec proves channel-count
    * convergence with the batch gate under ordered delivery. */
  def attributionTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us")).as[AE]
    typed.groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append)
      .toDF("event_id", "user_id", "channel")
  }

  def runningTotalsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.selectExpr("event_id", "user_id", "value").as[E]
    typed.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append)
      .toDF("user_id", "n_events", "total_value")
  }
}

/** transformWithState processor for [[EventsStream.attributionTws]]: one
  * (lastClickUs, lastViewUs) ValueState per user (−1 = never seen); each
  * purchase emits its channel under the SAME rule as the batch gate
  * (7-day lookback, click wins ties). Rows are sorted by (us, event_id)
  * INSIDE each batch, so the processor is correct whenever batches arrive
  * in event-time order per user (the file-per-trigger test discipline);
  * a production deployment would put a watermark-sized reorder buffer in
  * front, exactly like dropDuplicatesWithinWatermark does for q138. */
final class AttributionProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, EventsStream.AE, (Long, Long, String)] {

  @transient private var touch: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    touch = getHandle.getValueState[(Long, Long)]("touch",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[EventsStream.AE],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, String)] = {
    val week = EventsStream.AttributionLookbackUs
    var (lastClick, lastView) =
      if (touch.exists()) touch.get() else (-1L, -1L)
    val out = Seq.newBuilder[(Long, Long, String)]
    rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
      r.event_type match {
        case "purchase" =>
          val clickOk = lastClick >= 0 && r.us - lastClick <= week
          val viewOk = lastView >= 0 && r.us - lastView <= week
          val channel =
            if (clickOk && (!viewOk || lastClick >= lastView)) "click"
            else if (viewOk) "view"
            else "none"
          out += ((r.event_id, user, channel))
        case "click" => lastClick = r.us
        case "view"  => lastView = r.us
        case _       => ()
      }
    }
    touch.update((lastClick, lastView))
    out.result().iterator
  }
}

/** transformWithState processor for [[EventsStream.runningTotalsTws]]:
  * one named ValueState holding (count, sum) per user, no TTL (running
  * totals are meant to live forever), emitted on every update. */
final class RunningTotalsProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, EventsStream.E, (Long, Long, Double)] {

  @transient private var totals: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)]("totals",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[EventsStream.E],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Double)] = {
    val (n0, v0) = if (totals.exists()) totals.get() else (0L, 0.0)
    val batch = rows.toSeq
    val n = n0 + batch.size
    val v = v0 + batch.map(_.value).sum
    totals.update((n, v))
    Iterator((user, n, v))
  }
}
