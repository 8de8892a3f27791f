package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming document ingestion for a training-data pipeline: the batch
  * dedup operators ([[graft.ops.Dedup]]) re-expressed over an unbounded
  * stream, with state bounded by watermark/timeout so the queries run
  * indefinitely.
  */
object DocStream {

  val schema: StructType = StructType.fromDDL(
    "doc_id LONG, ts TIMESTAMP, text STRING")

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String,
      simhash: Long, bucket: Long)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Exact streaming dedup: drop any doc whose exact content (md5) was
    * already seen within the watermark — the streaming form of
    * `Dedup.exact`, state bounded by the watermark. */
  def exactDeduped(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")

  /** Streaming NEAR-dup dedup: drop any doc within `maxHamming` SimHash
    * bits of a previously emitted doc in the same signature-prefix bucket.
    *
    * Design for unbounded input:
    *  - per-row SimHash is the native codegen'd kernel (pure projection);
    *  - state is keyed by the signature's `prefixBits`-bit prefix — docs
    *    that can collide at small hamming distance usually share the
    *    prefix (single-probe approximation of multi-table LSH; raise
    *    `prefixBits` as volume grows, exactly like the LSH bucket rule);
    *  - each bucket keeps at most `maxSeen` recent fingerprints (FIFO) and
    *    the whole bucket state expires after 2 h of event time without
    *    traffic (`EventTimeTimeout`), so state size is bounded by
    *    (active buckets × maxSeen) regardless of stream length;
    *  - rows inside a micro-batch are processed in doc_id order, making
    *    the keep/drop decision deterministic under replays.
    */
  def nearDupFiltered(spark: SparkSession, docs: DataFrame, bits: Int = 60,
      prefixBits: Int = 12, maxHamming: Int = 3, maxSeen: Int = 1024): DataFrame = {
    import spark.implicits._
    val typed = docs
      // null text/ts can't be fingerprinted or watermarked — dropping them
      // here keeps the long-running query alive (a null simhash would fail
      // Doc's non-nullable Long on deserialization and kill the stream)
      .filter(col("text").isNotNull && col("ts").isNotNull)
      .withColumn("simhash", graft.functions.TextFunctions.simhash_md5(col("text"), bits))
      .withColumn("bucket", shiftright(col("simhash"), bits - prefixBits))
      .withWatermark("ts", "2 hours")
      .as[Doc]
    typed.groupByKey(_.bucket)
      .flatMapGroupsWithState[List[Long], (Long, java.sql.Timestamp, String)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[Doc], state: GroupState[List[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val batch = rows.toSeq.sortBy(_.doc_id)
            val out = batch.flatMap { d =>
              val dup = seen.exists(s =>
                java.lang.Long.bitCount(s ^ d.simhash) <= maxHamming)
              if (dup) None
              else {
                seen = (d.simhash :: seen).take(maxSeen)
                Some((d.doc_id, d.ts, d.text))
              }
            }
            state.update(seen)
            // expire 2h of EVENT time after this bucket's latest doc (not
            // after the pre-batch watermark, which is 0 on the first batch
            // and would expire everything as soon as it first advances)
            val latest = math.max(state.getCurrentWatermarkMs(),
              batch.map(_.ts.getTime).max)
            state.setTimeoutTimestamp(latest + 2L * 3600 * 1000)
            out.iterator
          }
      }
      .toDF("doc_id", "ts", "text")
  }
}
