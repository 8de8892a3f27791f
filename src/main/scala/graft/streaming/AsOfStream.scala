package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming AS-OF enrichment: the batch [[graft.ops.AsOf.joinPrior]]
  * semantics (for each fact, the latest dimension version with
  * `dimTime <= factTime` on the same key, greatest `tie` at equal times,
  * null when no prior exists) over two unbounded streams — the
  * reference's fact→dim latest-lookup (`DB_manager.py:190-196`
  * generalized) under LATE-ARRIVING dimension updates.
  *
  * Why a keyed-state operator and not a join: a stream-stream join must
  * bound BOTH sides' state by time range, but an as-of dimension version
  * stays relevant forever (until superseded) — the join shape Spark's
  * interval join cannot express. Here the dimension side IS the state:
  *
  *  - facts and dims union into one watermarked stream keyed by `key`;
  *  - each key's [[AsOfEnrichProcessor]] holds the retained dim versions
  *    and a buffer of pending facts, and registers an EVENT-TIME TIMER
  *    per fact timestamp;
  *  - a fact is enriched and emitted only when the watermark passes its
  *    timestamp — at that point no dim with `dimTime <= factTime` can
  *    still arrive (anything later is late beyond the watermark and was
  *    dropped at the source), so the lookup is FINAL and equals the
  *    batch join over everything delivered within the watermark delay
  *    (AsOfStreamSpec pins row-for-row parity with the q56 oracle's
  *    union/window formulation, streamed from the real events table);
  *  - on each firing the processor also COMPACTS the dim state: versions
  *    at or below the watermark can only ever serve future facts through
  *    their latest member (every future fact is younger than the
  *    watermark), so one survivor replaces the prefix — state is
  *    O(pending facts + in-flight dim versions + 1) per key, bounded
  *    regardless of stream length. Compaction runs on EVERY firing (even
  *    one with no ripe facts), and dim arrival itself arms a compaction
  *    timer just past the watermark, so the bound holds for dims-heavy
  *    and dims-ONLY keys too — not only on emission paths (r18 advice +
  *    r19; AsOfStreamSpec pins the fact-less key's state staying at one
  *    survivor).
  *
  * Exactly-once across restarts: state, timers, and the fact buffer live
  * in the checkpointed store; emissions are a deterministic function of
  * (state, watermark), so a replayed micro-batch re-emits identically
  * into the sink's own idempotence layer (AsOfStreamSpec restarts
  * mid-stream and checks the union).
  *
  * Output rows sit BEHIND the watermark by construction (that is what
  * makes them final), so this operator is terminal — it declares no
  * output event-time column and cannot feed another stateful operator;
  * enrichment is the last stateful hop before the sink, exactly like the
  * reference's serving query. Requires the RocksDB state store provider
  * (a hard `transformWithState` requirement, as everywhere else).
  *
  * 100 TB shape: one shuffle on `key`, per-key state independent of
  * history length (the compaction invariant), timers and lookups local
  * to the key — the operator scales with ACTIVE keys, not corpus size.
  */
object AsOfStream {

  case class TaggedIn(key: Long, ts: java.sql.Timestamp, isDim: Boolean,
      tie: Long, payload: String)
  case class Enriched(key: Long, ts: java.sql.Timestamp, fact: String,
      dim: String)

  /** @param facts `(key LONG, ts TIMESTAMP, fact STRING)` — the opaque
    *              `fact` payload rides through unchanged (`to_json` a
    *              struct to carry more than one column)
    * @param dims  `(key LONG, ts TIMESTAMP, tie LONG, dim STRING)` —
    *              `tie` breaks equal-time versions (greatest wins, the
    *              [[graft.ops.AsOf.joinPrior]] rule); `dim` is the
    *              opaque enrichment payload
    * @param watermarkDelay how out-of-order either stream may be; dims
    *              later than this relative to the global watermark are
    *              dropped (standard watermark contract) and facts wait
    *              this long before their lookup becomes final
    */
  def enrichPrior(spark: SparkSession, facts: DataFrame, dims: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame = {
    import spark.implicits._
    if (!spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
        .contains("RocksDB"))
      throw new IllegalStateException(
        "streaming as-of enrichment runs on transformWithState, which " +
          "requires the RocksDB state store: set spark.sql.streaming." +
          "stateStore.providerClass=org.apache.spark.sql.execution." +
          "streaming.state.RocksDBStateStoreProvider")
    val tagged = facts
      .select(col("key").cast("long"), col("ts"), lit(false).as("isDim"),
        lit(0L).as("tie"), col("fact").as("payload"))
      .unionByName(dims.select(col("key").cast("long"), col("ts"),
        lit(true).as("isDim"), col("tie").cast("long"),
        col("dim").as("payload")))
      .filter(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[TaggedIn]
    tagged.groupByKey(_.key)
      .transformWithState(new AsOfEnrichProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append)
      .toDF("key", "ts", "fact", "dim")
  }
}

/** Keyed processor for [[AsOfStream.enrichPrior]]: dim versions + pending
  * facts in list state, one event-time timer per pending fact timestamp,
  * emission and dim compaction on expiry (see the object doc for the
  * correctness argument). */
final class AsOfEnrichProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, AsOfStream.TaggedIn, AsOfStream.Enriched] {

  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TimerValues, TTLConfig}

  // state keeps event time in MICROSECONDS (Catalyst's native timestamp
  // resolution): Timestamp.getTime truncates to millis, and a dim half a
  // millisecond after a fact must still lose the <= comparison exactly as
  // it does in the batch join
  private def micros(ts: java.sql.Timestamp): Long =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(ts)

  // (tsUs, tie, payload) dim versions; (tsUs, payload) buffered facts
  @transient private var dims: ListState[(Long, Long, String)] = _
  @transient private var pending: ListState[(Long, String)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    dims = getHandle.getListState[(Long, Long, String)]("dims",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, String)](),
      TTLConfig.NONE)
    pending = getHandle.getListState[(Long, String)]("pending",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, String)](),
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long,
      rows: Iterator[AsOfStream.TaggedIn], timerValues: TimerValues)
      : Iterator[AsOfStream.Enriched] = {
    val wmMs = timerValues.getCurrentWatermarkInMs()
    val newTimers = scala.collection.mutable.SortedSet.empty[Long]
    var dimArrived = false
    rows.foreach { r =>
      val tsUs = micros(r.ts)
      if (r.isDim) {
        dims.appendValue((tsUs, r.tie, r.payload))
        dimArrived = true
      } else {
        pending.appendValue((tsUs, r.payload))
        // timers are millisecond-resolution: round the fact's micros UP so
        // the firing watermark is at or past the fact, and keep strictly
        // ahead of the current watermark (a fact admitted exactly at the
        // edge must still get a firing timer)
        newTimers += math.max((tsUs + 999) / 1000, wmMs + 1)
      }
    }
    // dims-ONLY traffic must still compact (r19): timers otherwise exist
    // only per fact, so a key that receives dim updates but no facts
    // would keep its entire version history — the documented
    // O(pending + in-flight + 1) bound requires a compaction opportunity
    // per dim batch. One timer just past the current watermark does it;
    // handleExpiredTimer compacts before (and regardless of) emission.
    // Duplicate registration across batches at an unmoved watermark is
    // harmless (same key+timestamp slot).
    if (dimArrived) newTimers += wmMs + 1
    newTimers.foreach(getHandle.registerTimer)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[AsOfStream.Enriched] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000
    val allDims = dims.get().toList
    // dim compaction FIRST — before the no-ripe-facts early return — so
    // EVERY timer firing enforces the O(pending + in-flight + 1) state
    // bound, not just emission paths (a key whose timers fire without ripe
    // facts must not retain its full dim prefix until the next emission):
    // versions at/below the watermark serve every future lookup through
    // their latest member only — one survivor replaces the prefix (total
    // order (ts, tie, payload) keeps replays deterministic)
    val (old, live) = allDims.partition(_._1 <= wmUs)
    if (old.nonEmpty) {
      dims.clear()
      (old.max :: live).foreach(dims.appendValue)
    }
    val (ripe, wait) = pending.get().toList.partition(_._1 <= wmUs)
    if (ripe.isEmpty) return Iterator.empty
    pending.clear()
    wait.foreach(pending.appendValue)
    // deterministic emission order; lookup = latest version <= fact ts
    ripe.sorted.iterator.map { case (tsUs, fact) =>
      val prior = allDims.filter(_._1 <= tsUs)
      AsOfStream.Enriched(key,
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(tsUs),
        fact, if (prior.isEmpty) null else prior.max._3)
    }
  }
}
