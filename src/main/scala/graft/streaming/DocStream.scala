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

  case class MhDoc(doc_id: Long, ts: java.sql.Timestamp, text: String,
      sig: Seq[String], bucket: String)

  case class RawDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  case class VotedDoc(doc_id: Long, ts: java.sql.Timestamp, text: String,
      dup: Boolean)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** End-to-end streaming dedup INGEST over the persisted signature index
    * ([[graft.ops.Dedup.ingestBatch]] per micro-batch via `foreachBatch`):
    * each batch is deduped against the committed index (and itself,
    * keep-first), admitted docs land at `<admittedPath>/batch=<id>`, and
    * their signatures append to the index under the micro-batch id — the
    * reference's advance-after-sink state contract (`API_manager.py:79-113`)
    * applied at the dedup layer. Effectively-once end to end: a restart
    * replays the last uncommitted micro-batch with the SAME batch id, the
    * batch marker short-circuits an already-completed one, and every step
    * of a partially-completed one is idempotent (see [[graft.ops.Dedup
    * .ingestBatch]]). */
  def dedupIngest(docs: DataFrame, indexPath: String, admittedPath: String,
      checkpoint: String, threshold: Double = 0.6, numHashes: Int = 8,
      shingleWidth: Int = 3, fast: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.ops.Dedup.ingestBatch(batch, id, indexPath, admittedPath,
          threshold, "doc_id", "text", numHashes, shingleWidth, fast)
      }
      .start()

  /** Streaming WINNOWING ingest (r17 — the q253 surface over an unbounded
    * stream): per micro-batch via `foreachBatch`, the batch's span-overlap
    * candidate pairs against the committed fingerprint index (and itself)
    * land at `<candPath>/batch=<id>` (idempotent overwrite), then the
    * batch's fingerprints append to the index under the micro-batch id,
    * marker committed LAST — effectively-once end to end, the
    * [[dedupIngest]] contract applied to the span-fingerprint family
    * (see [[graft.ops.Dedup.winnowIngestBatch]]). */
  def winnowIngest(docs: DataFrame, indexPath: String, candPath: String,
      checkpoint: String, k: Int = 4, w: Int = 4, maxDf: Int = 50,
      minShared: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.ops.Dedup.winnowIngestBatch(batch, id, indexPath, candPath,
          "doc_id", "text", k, w, maxDf, minShared)
      }
      .start()

  /** Streaming BM25 POSTING-INDEX ingest (r18 — the q254 serving index
    * over an unbounded stream): per micro-batch via `foreachBatch`,
    * exact within-batch dedup admits docs, then their postings + the
    * batch's corpus-stats sentinel append to the index under the
    * micro-batch id, marker committed LAST — effectively-once end to
    * end, the [[dedupIngest]]/[[winnowIngest]] contract applied to the
    * retrieval index (see [[graft.ops.TextRank.postingIngestBatch]]).
    * Retrieval serves from the committed view at any point
    * ([[graft.ops.TextRank.bm25TopKIndexed]]) with scores identical to
    * a full rebuild over the admitted corpus — DocStreamSpec pins the
    * parity across a restart. */
  def bm25Ingest(docs: DataFrame, indexPath: String, checkpoint: String,
      compactAbove: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.ops.TextRank.postingIngestBatch(batch, id, indexPath,
          "doc_id", "text", compactAbove)
      }
      .start()

  /** Streaming CURATION ingest (r19 — the q244 funnel shape as ONE
    * `foreachBatch` loop, the composition a 100 TB continuous-ingest
    * pipeline actually runs): per micro-batch, quality gate → MinHash
    * dedup admit → winnowing span candidates → BM25 posting index, all
    * downstream stages consuming the SAME admit decision, with one
    * per-batch funnel row (docs in / past-quality / admitted) recorded
    * exactly-once beside the indexes. See [[curateBatch]] for the
    * stage-by-stage contract. */
  def curateIngest(docs: DataFrame, root: String, checkpoint: String,
      minQuality: Double = 0.0, threshold: Double = 0.6, numHashes: Int = 8,
      shingleWidth: Int = 3, k: Int = 4, w: Int = 4, maxDf: Int = 50,
      minShared: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        curateBatch(batch, id, root, minQuality, threshold, numHashes,
          shingleWidth, k, w, maxDf, minShared)
      }
      .start()

  /** One COMPOSED curation-ingest step — the per-stage exactly-once
    * contracts ([[graft.ops.Dedup.ingestBatch]],
    * [[graft.ops.Dedup.winnowIngestBatch]],
    * [[graft.ops.TextRank.postingIngestBatch]]) chained under ONE admit
    * decision, with artifact layout under `root`:
    *
    *   1. quality gate: docs with
    *      [[graft.ops.TextOps.qualityScore]] >= `minQuality` (scored
    *      ONCE on a persisted frame; the funnel counts ride that
    *      materialization as an `Observation` — the q244 observed-
    *      metrics discipline, zero extra passes over the batch);
    *   2. dedup admit: `Dedup.ingestBatch` over the gated docs — the
    *      batch's near-dups of (committed index ∪ earlier-in-batch)
    *      drop; survivors land at `<root>/admitted/batch=<id>` and
    *      their signatures commit to `<root>/mh_idx`. This is THE admit
    *      decision: every later stage consumes the admitted sink, so
    *      the three indexes can never disagree about membership;
    *   3. span candidates: `winnowIngestBatch` over the ADMITTED docs →
    *      pairs at `<root>/span_cand/batch=<id>`, fingerprints to
    *      `<root>/win_idx`;
    *   4. retrieval: `postingIngestBatch` over the ADMITTED docs →
    *      postings + corpus-stats sentinel to `<root>/bm25_idx`;
    *   5. funnel: one (batch_id, n_in, n_gated, n_admitted) row appends
    *      to `<root>/funnel` — marker committed LAST, so ITS presence
    *      proves the whole composed step completed.
    *
    * Exactly-once ACROSS the composition: a replay (same batchId)
    * short-circuits on the funnel marker; a crash at ANY interior point
    * re-runs the step, where each stage either short-circuits on its own
    * marker or heals its partial write (per-batch sink overwrites are
    * idempotent, index staging replaces rather than doubles), and the
    * admit decision is deterministic given (batch, committed mh index) —
    * so the retried composition converges to the identical state
    * (DocStreamSpec kills the loop between stages and pins it).
    *
    * 100 TB shape: per-ingest cost ∝ batch at every stage (signatures,
    * fingerprints, postings are per-doc projections; candidates probe
    * the committed indexes, never scan them; the funnel row is one
    * observation + one metadata count), and serving reads only committed
    * views — the funnel composes the certified per-stage shapes without
    * adding a single corpus-proportional pass. */
  def curateBatch(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long, root: String, minQuality: Double = 0.0,
      threshold: Double = 0.6, numHashes: Int = 8, shingleWidth: Int = 3,
      k: Int = 4, w: Int = 4, maxDf: Int = 50, minShared: Int = 2): Unit = {
    val spark = batch.sparkSession
    val funnelPath = s"$root/funnel"
    if (graft.ops.BatchIndex.isCommitted(spark, funnelPath, batchId)) return
    val en = graft.ops.TextOps.langProfiles.head._2
    val scored = batch
      .filter(col("text").isNotNull)
      .withColumn("__q", graft.ops.TextOps.qualityScore(col("text"), en))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val obs = org.apache.spark.sql.Observation()
      scored.observe(obs, count(lit(1)).as("n_in"),
        count(when(col("__q") >= minQuality, 1)).as("n_gated")).count()
      val gated = scored.filter(col("__q") >= lit(minQuality)).drop("__q")
      graft.ops.Dedup.ingestBatch(gated, batchId, s"$root/mh_idx",
        s"$root/admitted", threshold, "doc_id", "text", numHashes,
        shingleWidth)
      // explicit schema: a fully-deduped (or fully-gated-out) batch writes
      // an EMPTY admitted sink, whose parquet dir may carry no footer to
      // infer from — the read must not depend on survivors existing
      val admitted = spark.read.schema(gated.schema)
        .parquet(s"$root/admitted/batch=$batchId")
      graft.ops.Dedup.winnowIngestBatch(admitted, batchId, s"$root/win_idx",
        s"$root/span_cand", "doc_id", "text", k, w, maxDf, minShared)
      graft.ops.TextRank.postingIngestBatch(admitted, batchId,
        s"$root/bm25_idx", "doc_id", "text")
      // funnel row: the quality counts ride the scored materialization
      // above (already delivered by the time the stages finish — a 5 s
      // await bounds the pathological listener-bus case, falling back to
      // a direct aggregate, the q244 discipline); n_admitted is a
      // metadata-only count over the just-written per-batch sink
      val (nIn, nGated) =
        try {
          val m = scala.concurrent.Await.result(obs.future,
            scala.concurrent.duration.Duration(5, "s"))
          (m.getLong(0), m.getLong(1))
        } catch {
          case scala.util.control.NonFatal(_) =>
            val r = scored.agg(count(lit(1)),
              count(when(col("__q") >= minQuality, 1))).head
            (r.getLong(0), r.getLong(1))
        }
      val nAdmitted = admitted.count()
      val funnelRow = spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row(batchId, nIn, nGated, nAdmitted)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_in",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_gated",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_admitted",
            org.apache.spark.sql.types.LongType))))
      graft.ops.BatchIndex.appendBatch(funnelRow, funnelPath, batchId,
        s"curation_funnel minQuality=$minQuality threshold=$threshold")
    } finally { scored.unpersist(); () }
  }

  /** Committed per-batch funnel rows of a [[curateIngest]] loop. */
  def curationFunnel(spark: SparkSession, root: String): DataFrame =
    graft.ops.BatchIndex.readCommitted(spark, s"$root/funnel")

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
    *
    * CHECKPOINT COMPATIBILITY: the keyed-state encoding is
    * `(Long, List[Long])` (registered expiry, recent fingerprints) since
    * round 8 — a checkpoint written by the pre-round-8 `List[Long]` layout
    * fails state-schema validation on restart (likewise the MinHash path's
    * `(Long, List[Seq[String]])`). Restart such a query from a fresh
    * checkpoint; dedup state rebuilds from traffic within one watermark.
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
      .flatMapGroupsWithState[(Long, List[Long]), (Long, java.sql.Timestamp, String)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[Doc], state: GroupState[(Long, List[Long])]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (expiry, seen) = state.getOption.getOrElse((0L, List.empty[Long]))
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
            // expire 2h of EVENT time after this bucket's latest-EVER doc:
            // not the pre-batch watermark (0 on the first batch — would
            // expire everything as soon as it advances), and monotone in
            // the previously registered expiry — a batch of LATE rows must
            // never move the timer earlier and evict live state
            val latest = math.max(state.getCurrentWatermarkMs(),
              batch.map(_.ts.getTime).max)
            expiry = math.max(expiry, latest + 2L * 3600 * 1000)
            state.update((expiry, seen))
            state.setTimeoutTimestamp(expiry)
            out.iterator
          }
      }
      .toDF("doc_id", "ts", "text")
  }

  /** Streaming MINHASH near-dup dedup — the q24 (shingle-Jaccard) semantics
    * next to [[nearDupFiltered]]'s SimHash ones. The two families catch
    * different modifications: SimHash is a bag-of-tokens fingerprint, so a
    * few token SUBSTITUTIONS scatter many bits (hamming blows past the
    * radius and the dup sails through), while shingle-MinHash agreement
    * degrades smoothly with Jaccard and still fires.
    *
    * Design for unbounded input (same rules as the SimHash path):
    *  - per-row signature is the native `min_hash_slices` kernel (pure
    *    projection, `numHashes` md5-derived minima over `shingleWidth`-
    *    token shingles);
    *  - state is keyed by the ANCHOR BAND — the first `bandRows` signature
    *    slots concatenated. Docs at Jaccard J share it with probability
    *    J^bandRows (single-probe banded LSH, the same approximation as the
    *    SimHash prefix bucket; production multi-probe = a union of k such
    *    queries with band i as the bucket, or the batch path q24);
    *  - in-bucket verify: estimated Jaccard = fraction of agreeing
    *    signature slots ≥ `estJaccard` (the standard MinHash estimator);
    *  - each bucket keeps ≤ `maxSeen` signatures (FIFO), whole bucket
    *    expires after 2 h of event time without traffic — state bounded by
    *    (active buckets × maxSeen × numHashes) regardless of stream length;
    *  - rows inside a micro-batch process in doc_id order → deterministic
    *    keep/drop under replays.
    */
  def minhashNearDupFiltered(spark: SparkSession, docs: DataFrame,
      shingleWidth: Int = 3, numHashes: Int = 12, bandRows: Int = 2,
      estJaccard: Double = 0.6, maxSeen: Int = 1024): DataFrame = {
    import spark.implicits._
    require(bandRows >= 1 && bandRows <= numHashes, "bandRows out of range")
    val withSig = docs
      .filter(col("text").isNotNull && col("ts").isNotNull)
      .withColumn("sig", graft.functions.TextFunctions
        .min_hash_slices(col("text"), shingleWidth, numHashes))
    // docs shorter than the shingle width have NO signature (null array):
    // they bypass the near-dup state entirely and are always kept — the
    // same semantics as the batch path, which filters them out of the
    // signature table (a null sig stored in keyed state would NPE the
    // dup check and kill the long-running query)
    val short = withSig.filter(col("sig").isNull)
      .select(col("doc_id"), col("ts"), col("text"))
    val typed = withSig.filter(col("sig").isNotNull)
      .withColumn("bucket", concat_ws("", slice(col("sig"), 1, bandRows)))
      .withWatermark("ts", "2 hours")
      .as[MhDoc]
    val need = math.ceil(estJaccard * numHashes).toInt
    typed.groupByKey(_.bucket)
      .flatMapGroupsWithState[(Long, List[Seq[String]]), (Long, java.sql.Timestamp, String)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[MhDoc], state: GroupState[(Long, List[Seq[String]])]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (expiry, seen) = state.getOption.getOrElse((0L, List.empty[Seq[String]]))
            val batch = rows.toSeq.sortBy(_.doc_id)
            val out = batch.flatMap { d =>
              val dup = seen.exists { s =>
                var agree = 0; var i = 0
                while (i < numHashes) {
                  if (s(i) == d.sig(i)) agree += 1
                  i += 1
                }
                agree >= need
              }
              if (dup) None
              else {
                seen = (d.sig :: seen).take(maxSeen)
                Some((d.doc_id, d.ts, d.text))
              }
            }
            // same latest-ever monotone expiry rule as the SimHash path
            val latest = math.max(state.getCurrentWatermarkMs(),
              batch.map(_.ts.getTime).max)
            expiry = math.max(expiry, latest + 2L * 3600 * 1000)
            state.update((expiry, seen))
            state.setTimeoutTimestamp(expiry)
            out.iterator
          }
      }
      .toDF("doc_id", "ts", "text")
      .unionByName(short)
  }

  /** MULTI-PROBE streaming MinHash near-dup — closes the recall hole the
    * single-probe paths document: [[minhashNearDupFiltered]] keys state on
    * ONE anchor band, so a true near-dup whose anchor band happens to
    * disagree (probability 1 − J^bandRows per band) sails through.
    * Production banded LSH probes k bands; at Jaccard J the miss
    * probability drops from 1 − J^bandRows to (1 − J^bandRows)^k.
    *
    * Spark-native composition, two keyed stages in ONE streaming query:
    *  1. each doc explodes into `nBands` probe rows — band i's bucket key
    *     is (i | signature slots [i·bandRows, (i+1)·bandRows)) — and a
    *     `flatMapGroupsWithState` keyed by that bucket runs the SAME
    *     check/insert/FIFO/event-time-expiry logic as the single-probe
    *     path, per band, emitting the doc plus a per-band dup vote;
    *  2. all k votes of a doc land in the SAME micro-batch (the explode
    *     happens inside it), so a second stateless-by-construction
    *     `flatMapGroupsWithState` keyed by doc_id unions them and emits
    *     the doc only if NO band matched — the "union of per-band state
    *     lookups" without any cross-group coordination.
    *
    * State bounds are the single-probe ones × nBands (each band bucket
    * keeps ≤ maxSeen signatures, expires 2 h after its latest traffic).
    * A doc flagged dup by band i is still inserted into the OTHER bands'
    * buckets (band-local decisions — groups cannot see each other's
    * votes); that only makes later matching more likely, never less, so
    * dedup stays conservative.
    *
    * The chain runs on `transformWithState` with an explicit output
    * event-time column — the Spark 4 API designed for chaining stateful
    * operators, which the global-watermark correctness check accepts
    * as-is (the former `flatMapGroupsWithState` form could only run with
    * `statefulOperator.checkCorrectness.enabled=false`, stripping a real
    * safety guard from every other streaming query in the session).
    * Every stage re-emits each doc's ORIGINAL `ts`, which is at or above
    * the watermark that admitted it, so no stage can produce a row a
    * downstream stage would drop. Requires the RocksDB state store
    * provider (fails fast otherwise — a hard `transformWithState`
    * requirement, same as [[minhashNearDupFilteredTws]]). */
  def minhashNearDupFilteredMultiProbe(spark: SparkSession, docs: DataFrame,
      shingleWidth: Int = 3, numHashes: Int = 12, bandRows: Int = 2,
      nBands: Int = 3, estJaccard: Double = 0.6, maxSeen: Int = 1024): DataFrame = {
    import spark.implicits._
    require(nBands >= 1 && nBands * bandRows <= numHashes,
      "nBands*bandRows must fit in numHashes")
    if (!spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
        .contains("RocksDB"))
      throw new IllegalStateException(
        "multi-probe streaming dedup runs on transformWithState, which " +
          "requires the RocksDB state store: set spark.sql.streaming." +
          "stateStore.providerClass=org.apache.spark.sql.execution." +
          "streaming.state.RocksDBStateStoreProvider")
    // collapse same-id occurrences WITHIN the micro-batch first: after
    // the band explode, occurrences are indistinguishable at the vote
    // union, where a replayed copy's dup votes (it matches the first
    // copy's just-inserted signatures) would veto the first copy's clean
    // votes and lose the document entirely. Stateless by construction —
    // the processor never writes state, so this collapses within one
    // batch only; a replay in a LATER batch is dropped by the band state,
    // which is correct dedup output either way.
    val uniq = docs
      .filter(col("text").isNotNull && col("ts").isNotNull)
      .select(col("doc_id").cast("long"), col("ts"), col("text"))
      .withWatermark("ts", "2 hours")
      .as[RawDoc]
      .groupByKey(_.doc_id)
      .transformWithState(new CollapseFirstProcessor, "ts", OutputMode.Append)
      .toDF()
    val withSig = uniq
      .withColumn("sig", graft.functions.TextFunctions
        .min_hash_slices(col("text"), shingleWidth, numHashes))
    // short docs (no signature) bypass the probe stages and are kept —
    // see [[minhashNearDupFiltered]]
    val short = withSig.filter(col("sig").isNull)
      .select(col("doc_id"), col("ts"), col("text"))
    // the event-time metadata on `ts` (established by the collapse stage's
    // output event-time column) survives these projections, so the band
    // stage chains legally without re-declaring a watermark
    val probes = withSig.filter(col("sig").isNotNull)
      .withColumn("band", explode(array((0 until nBands).map(lit): _*)))
      .withColumn("bucket", concat_ws("|", col("band").cast("string"),
        concat_ws("", slice(col("sig"), col("band") * bandRows + 1, lit(bandRows)))))
      .drop("band")
      .as[MhDoc]
    val need = math.ceil(estJaccard * numHashes).toInt
    val voted = probes.groupByKey(_.bucket)
      .transformWithState(
        new MultiProbeBandProcessor(numHashes, need, maxSeen), "ts",
        OutputMode.Append)
    // vote union: the k probe rows of a doc are all in this micro-batch,
    // so the processor sees every vote at once and keeps NO state
    voted.groupByKey(_.doc_id)
      .transformWithState(new VoteUnionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append)
      .toDF("doc_id", "ts", "text")
      .unionByName(short)
  }

  /** [[minhashNearDupFiltered]] on the Spark 4 `transformWithState` API —
    * the second migrated operator (next to
    * [[EventsStream.runningTotalsTws]]), chosen because it exercises what
    * `flatMapGroupsWithState` structurally can't: TWO named state
    * variables (a ListState of recent signatures + a ValueState tracking
    * the registered expiry) and an explicit event-time TIMER for bucket
    * expiry, where the legacy API folds everything into one opaque value
    * and one implicit timeout slot. Identical keep/drop semantics —
    * DocStreamSpec pins batch-for-batch parity. Requires the RocksDB
    * state store provider (see [[EventsStream.runningTotalsTws]]). */
  def minhashNearDupFilteredTws(spark: SparkSession, docs: DataFrame,
      shingleWidth: Int = 3, numHashes: Int = 12, bandRows: Int = 2,
      estJaccard: Double = 0.6, maxSeen: Int = 1024): DataFrame = {
    import spark.implicits._
    require(bandRows >= 1 && bandRows <= numHashes, "bandRows out of range")
    val withSig = docs
      .filter(col("text").isNotNull && col("ts").isNotNull)
      .withColumn("sig", graft.functions.TextFunctions
        .min_hash_slices(col("text"), shingleWidth, numHashes))
    // short docs bypass the stateful path — see [[minhashNearDupFiltered]]
    val short = withSig.filter(col("sig").isNull)
      .select(col("doc_id"), col("ts"), col("text"))
    val typed = withSig.filter(col("sig").isNotNull)
      .withColumn("bucket", concat_ws("", slice(col("sig"), 1, bandRows)))
      .withWatermark("ts", "2 hours")
      .as[MhDoc]
    val need = math.ceil(estJaccard * numHashes).toInt
    typed.groupByKey(_.bucket)
      .transformWithState(new MinHashDedupProcessor(numHashes, need, maxSeen),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append)
      .toDF("doc_id", "ts", "text")
      .unionByName(short)
  }

  /** Continuous corpus monitoring: per micro-batch, ONE (batch_id, KLL
    * sketch, exact count) row is appended to a [[graft.ops.BatchIndex]]
    * artifact — `foreachBatch` may replay a batch after a crash, and the
    * index's commit markers make the replay a no-op, so the monitor is
    * exactly-once without any output-side dedup. "Corpus length quantiles
    * so far" is then [[corpusLengthQuantiles]]: a union of kilobyte
    * sketch blobs, NEVER a re-scan of ingested data — the q99 artifact
    * pattern running continuously. */
  def sketchMonitorIngest(docs: DataFrame, sketchPath: String,
      checkpoint: String, k: Int = 200)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sketchBatch(batch, id, sketchPath, k)
      }
      .start()

  /** One monitor append (exactly-once per `batchId`; see
    * [[sketchMonitorIngest]]). Public so a non-streaming ingest loop can
    * reuse the same artifact protocol. */
  def sketchBatch(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long, sketchPath: String, k: Int): Unit = {
    import graft.functions.KllFunctions._
    val row = batch.agg(
        kll_sketch_agg(length(col("text")).cast("double"), k).as("sk"),
        count(col("text")).as("n"))
      .withColumn("batch_id", lit(batchId))
    graft.ops.BatchIndex.appendBatch(row, sketchPath, batchId,
      meta = s"kll_monitor k=$k")
  }

  /** Serve the monitor: union all committed per-batch sketches and read
    * quantiles — O(batches) kilobyte blobs, independent of corpus size. */
  def corpusLengthQuantiles(spark: SparkSession, sketchPath: String,
      ranks: Seq[Double], k: Int = 200): DataFrame = {
    import graft.functions.KllFunctions._
    val merged = graft.ops.BatchIndex.readCommitted(spark, sketchPath)
      .agg(kll_merge_agg(col("sk"), k).as("sk"),
        org.apache.spark.sql.functions.sum(col("n")).as("n"))
    merged.select(col("n") +:
      ranks.map(r => kll_quantile(col("sk"), lit(r))
        .as(s"p${math.round(r * 100)}")): _*)
  }
}

/** Stateless collapse stage of the multi-probe chain: emits the FIRST row
  * of each doc_id group in the micro-batch (rows of one key arrive
  * together; no state is kept, so the collapse is batch-local by
  * construction). */
final class CollapseFirstProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, DocStream.RawDoc, DocStream.RawDoc] {
  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = ()
  override def handleInputRows(id: Long, rows: Iterator[DocStream.RawDoc],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[DocStream.RawDoc] =
    Iterator.single(rows.next())
}

/** Band stage of the multi-probe chain: the single-probe check/insert/
  * FIFO/event-time-expiry logic ([[MinHashDedupProcessor]]) per band
  * bucket, emitting every doc WITH its per-band dup vote instead of
  * filtering. */
final class MultiProbeBandProcessor(numHashes: Int, need: Int, maxSeen: Int)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    String, DocStream.MhDoc, DocStream.VotedDoc] {

  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TimerValues, TTLConfig, ValueState}

  private val TtlMs = 2L * 3600 * 1000

  @transient private var sigs: ListState[Seq[String]] = _
  @transient private var expiry: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    sigs = getHandle.getListState[Seq[String]]("sigs",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]](),
      TTLConfig.NONE)
    expiry = getHandle.getValueState[Long]("expiry",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(bucket: String,
      rows: Iterator[DocStream.MhDoc], timerValues: TimerValues)
      : Iterator[DocStream.VotedDoc] = {
    var seen = sigs.get().toList
    val batch = rows.toSeq.sortBy(_.doc_id)
    val out = batch.map { d =>
      val dup = seen.exists { s =>
        var agree = 0; var i = 0
        while (i < numHashes) {
          if (s(i) == d.sig(i)) agree += 1
          i += 1
        }
        agree >= need
      }
      if (!dup) seen = (d.sig :: seen).take(maxSeen)
      DocStream.VotedDoc(d.doc_id, d.ts, d.text, dup)
    }
    sigs.put(seen.toArray)
    // same latest-ever monotone expiry rule as MinHashDedupProcessor
    val latest = math.max(timerValues.getCurrentWatermarkInMs(),
      batch.map(_.ts.getTime).max)
    val newExpiry = math.max(latest + TtlMs,
      if (expiry.exists()) expiry.get() else 0L)
    if (expiry.exists() && expiry.get() != newExpiry)
      getHandle.deleteTimer(expiry.get())
    if (!expiry.exists() || expiry.get() != newExpiry) {
      getHandle.registerTimer(newExpiry)
      expiry.update(newExpiry)
    }
    out.iterator
  }

  override def handleExpiredTimer(bucket: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[DocStream.VotedDoc] = {
    sigs.clear()
    expiry.clear()
    Iterator.empty
  }
}

/** Stateless vote-union stage of the multi-probe chain: all `nBands` probe
  * rows of a doc land in the same micro-batch (the explode happens inside
  * it), so the processor sees every vote at once — keep the doc only when
  * NO band flagged it. */
final class VoteUnionProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, DocStream.VotedDoc, (Long, java.sql.Timestamp, String)] {
  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = ()
  override def handleInputRows(id: Long, rows: Iterator[DocStream.VotedDoc],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, java.sql.Timestamp, String)] = {
    val vs = rows.toSeq
    if (vs.exists(_.dup)) Iterator.empty
    else Iterator.single((vs.head.doc_id, vs.head.ts, vs.head.text))
  }
}

/** transformWithState processor for [[DocStream.minhashNearDupFilteredTws]]:
  * per bucket, a ListState of the ≤ `maxSeen` most recent signatures and a
  * ValueState holding the currently registered expiry timer (so each batch
  * can delete-then-rearm it), with an event-time timer clearing the whole
  * bucket 2 h after its latest traffic. */
final class MinHashDedupProcessor(numHashes: Int, need: Int, maxSeen: Int)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    String, DocStream.MhDoc, (Long, java.sql.Timestamp, String)] {

  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TimerValues, TTLConfig, ValueState}

  private val TtlMs = 2L * 3600 * 1000

  @transient private var sigs: ListState[Seq[String]] = _
  @transient private var expiry: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    sigs = getHandle.getListState[Seq[String]]("sigs",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]](),
      TTLConfig.NONE)
    expiry = getHandle.getValueState[Long]("expiry",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(bucket: String,
      rows: Iterator[DocStream.MhDoc], timerValues: TimerValues)
      : Iterator[(Long, java.sql.Timestamp, String)] = {
    var seen = sigs.get().toList
    val batch = rows.toSeq.sortBy(_.doc_id)
    val out = batch.flatMap { d =>
      val dup = seen.exists { s =>
        var agree = 0; var i = 0
        while (i < numHashes) {
          if (s(i) == d.sig(i)) agree += 1
          i += 1
        }
        agree >= need
      }
      if (dup) None
      else {
        seen = (d.sig :: seen).take(maxSeen)
        Some((d.doc_id, d.ts, d.text))
      }
    }
    sigs.put(seen.toArray)
    // rearm the bucket-expiry timer: 2 h of event time past the bucket's
    // latest-EVER doc — monotone in the registered expiry, so a batch of
    // late rows can never move the timer earlier and evict live state
    val latest = math.max(timerValues.getCurrentWatermarkInMs(),
      batch.map(_.ts.getTime).max)
    val newExpiry = math.max(latest + TtlMs,
      if (expiry.exists()) expiry.get() else 0L)
    if (expiry.exists() && expiry.get() != newExpiry)
      getHandle.deleteTimer(expiry.get())
    if (!expiry.exists() || expiry.get() != newExpiry) {
      getHandle.registerTimer(newExpiry)
      expiry.update(newExpiry)
    }
    out.iterator
  }

  override def handleExpiredTimer(bucket: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[(Long, java.sql.Timestamp, String)] = {
    sigs.clear()
    expiry.clear()
    Iterator.empty
  }
}
