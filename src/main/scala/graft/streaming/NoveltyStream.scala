package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Streaming corpus-novelty monitor: the q122 novelty-saturation curve ON
  * THE INGEST STREAM. Per micro-batch, the fraction of distinct 3-shingle
  * grams never seen in ANY earlier batch, with the seen-set held as
  * SHARDED BLOOM FILTER BYTES in `transformWithState` state — bounded at
  * nShards × bits/8 bytes for the corpus lifetime, however much data
  * streams through. A Bloom false positive only UNDER-counts novelty —
  * the conservative direction for a "stop crawling this feed" signal —
  * and the FP rate is sizeable only as the filter saturates, exactly when
  * novelty is low anyway.
  *
  * 100 TB shape: grams shard by hash, so state and work distribute across
  * executors; each shard's per-batch emission is ONE tiny stat row, and
  * the monitor's output stream is nShards rows per batch regardless of
  * ingest volume. Widen `bits` (or nShards) to hold the FP rate at a
  * bigger corpus — 2^20 bits/shard × 256 shards ≈ 32 MB of state for
  * ~10⁸ grams at ~1% FP.
  */
object NoveltyStream {

  case class GramRow(shard: Int, h: Long)
  case class ShardStat(shard: Int, n_grams: Long, n_new: Long)

  /** Per-(batch, shard) novelty stats over the doc stream (needs the
    * RocksDB state-store provider, like every transformWithState op).
    * Aggregate `n_new / n_grams` over shards downstream for the corpus
    * curve. */
  def noveltyStats(spark: SparkSession, docs: DataFrame, nShards: Int = 64,
      bits: Int = 1 << 17): DataFrame = {
    import spark.implicits._
    val grams = docs
      .select(explode(graft.functions.TextFunctions
        .distinct_shingles(col("text"), 3)).as("sh"))
      .select(xxhash64(col("sh")).as("h"))
      .select(pmod(col("h"), lit(nShards.toLong)).cast("int").as("shard"), col("h"))
      .as[GramRow]
    grams.groupByKey(_.shard)
      .transformWithState(new BloomNoveltyProcessor(bits),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}

/** Bloom-state novelty counter for one gram shard: membership = 3 probe
  * bits derived from the gram hash (golden-ratio remix per probe). State
  * is a single byte-array ValueState per shard — no per-gram rows, ever.
  */
final class BloomNoveltyProcessor(bits: Int)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Int, NoveltyStream.GramRow, NoveltyStream.ShardStat] {

  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}

  @transient private var bloom: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bloom = getHandle.getValueState[Array[Byte]]("bloom",
      org.apache.spark.sql.Encoders.BINARY, TTLConfig.NONE)

  private def probe(h: Long, j: Int): Int = {
    val mixed = (h + j.toLong * 0x9E3779B97F4A7C15L) & Long.MaxValue
    (mixed % bits).toInt
  }

  override def handleInputRows(shard: Int,
      rows: Iterator[NoveltyStream.GramRow], timerValues: TimerValues)
      : Iterator[NoveltyStream.ShardStat] = {
    val bytes = if (bloom.exists()) bloom.get() else new Array[Byte](bits / 8)
    // batch-local distinct: novelty counts GRAMS, not occurrences
    val seenBatch = new java.util.HashSet[java.lang.Long]()
    var nGrams = 0L
    var nNew = 0L
    rows.foreach { r =>
      if (seenBatch.add(r.h)) {
        nGrams += 1
        var isNew = false
        var j = 0
        while (j < 3) {
          val p = probe(r.h, j)
          if ((bytes(p >> 3) & (1 << (p & 7))) == 0) isNew = true
          j += 1
        }
        if (isNew) {
          nNew += 1
          j = 0
          while (j < 3) {
            val p = probe(r.h, j)
            bytes(p >> 3) = (bytes(p >> 3) | (1 << (p & 7))).toByte
            j += 1
          }
        }
      }
    }
    bloom.update(bytes)
    Iterator.single(NoveltyStream.ShardStat(shard, nGrams, nNew))
  }
}
