package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The STREAMING composition gate (the q244 counterpart for the stream
  * side, r14 verdict item 7): dedup ingest → signature-index append →
  * bloom novelty monitor over the admitted stream, exercised as ONE
  * wired lineage with BOTH queries restarted mid-stream from their
  * checkpoints. The individual pieces are spec'd piecewise elsewhere
  * (DocStreamSpec restart, NoveltyStream processor); this pins the
  * composition properties no piecewise test sees:
  *
  *  - the monitor observes exactly the ADMITTED corpus (dropped dups
  *    never reach it),
  *  - bloom state survives the restart (grams first seen before the
  *    restart stay non-novel after it),
  *  - total novelty over the whole run equals the exact first-seen
  *    distinct-gram count — independent of how micro-batches split.
  */
class StreamCompositionSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(15)
  private val vocab = Vector.tabulate(200)(i => s"w$i")
  private def doc(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
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

  /** Exact batch-land replay of the novelty semantics: per-shard count
    * of DISTINCT gram hashes over the given texts — what the bloom
    * monitor's summed n_new must equal when no false positive fires
    * (first-seen-once is batch-split independent, so no ordering or
    * micro-batch alignment is needed). */
  private def exactDistinctGrams(texts: Seq[String], nShards: Int = 64) =
    texts.toDF("text")
      .select(explode(graft.functions.TextFunctions
        .distinct_shingles(col("text"), 3)).as("sh"))
      .select(xxhash64(col("sh")).as("h"))
      .select(pmod(col("h"), lit(nShards.toLong)).cast("int").as("shard"), col("h"))
      .distinct()
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("composed lineage: ingest admits, index appends, novelty monitors " +
      "— exactly-once end state across a mid-stream restart of BOTH queries") {
    withRocksDb {
      val base = (0 until 8).map(i => (i.toLong, ts(i), doc(40)))
      val srcDir = tmpDir("comp-src")
      base.toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("overwrite").parquet(srcDir)
      val t0 = System.currentTimeMillis() - 180000
      def stampNew(mtime: Long): Unit =
        new java.io.File(srcDir).listFiles()
          .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > mtime)
          .foreach(f => assert(f.setLastModified(mtime)))
      stampNew(t0)
      // file 2: an exact dup of doc 1 (must be dropped and never reach
      // the monitor) + two fresh docs; ids stay monotone per the ingest
      // contract
      val fresh11 = doc(40); val fresh12 = doc(40)
      Seq((10L, ts(8), base(1)._3), (11L, ts(9), fresh11), (12L, ts(10), fresh12))
        .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(srcDir)
      stampNew(t0 + 30000)

      val root = tmpDir("comp-out")
      val idx = s"$root/idx"; val adm = s"$root/admitted"
      val ingestCkpt = s"$root/ingest_ckpt"
      val novCkpt = s"$root/nov_ckpt"; val novOut = s"$root/novelty"

      def runIngest(): Unit = {
        val q = DocStream.dedupIngest(
          DocStream.read(spark, srcDir).select("doc_id", "text"),
          idx, adm, ingestCkpt, 0.5)
        try q.processAllAvailable() finally q.stop()
      }
      def runNovelty(): Unit = {
        val admitted = spark.readStream
          .schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$adm/batch=*")
        val q = NoveltyStream.noveltyStats(spark, admitted)
          .writeStream.format("parquet")
          .option("path", novOut)
          .option("checkpointLocation", novCkpt)
          .start()
        try q.processAllAvailable() finally q.stop()
      }

      // ---- phase 1: both queries run, then STOP (the restart point) ----
      runIngest()
      runNovelty()
      def admitted() = spark.read.parquet(adm).select("doc_id").as[Long].collect().toSet
      val phase1Admitted = admitted()
      assert(phase1Admitted === (base.map(_._1).toSet ++ Set(11L, 12L)),
        s"phase-1 admissions: $phase1Admitted")
      val phase1MonitorRows = spark.read.parquet(novOut).count()
      assert(phase1MonitorRows > 0, "monitor emitted nothing before the restart")

      // ---- new data lands while both queries are DOWN ----
      // doc 20: exact dup of doc 2 — dropped; doc 21: fresh, but its
      // first 5 tokens are doc 0's, PLANTING >= 3 grams first seen
      // before the restart — if bloom state did not survive, these would
      // re-count as novel and the exact-replay equality below would fail
      val sharedPrefix = base(0)._3.split(" ").take(5)
      val doc21 = (sharedPrefix ++ doc(35).split(" ")).mkString(" ")
      Seq((20L, ts(11), base(2)._3), (21L, ts(12), doc21))
        .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(srcDir)
      stampNew(t0 + 60000)

      // ---- phase 2: restart BOTH from their checkpoints ----
      runIngest()
      runNovelty()

      val finalAdmitted = admitted()
      assert(finalAdmitted === phase1Admitted + 21L, s"got $finalAdmitted")
      // the index holds signatures for exactly the admitted corpus
      val indexed = graft.ops.Dedup.readSignatureIndex(spark, idx)
        .select("id").distinct().as[Long].collect().toSet
      assert(indexed === finalAdmitted)

      // the monitor ran in BOTH phases and over the whole admitted corpus
      val nov = spark.read.parquet(novOut)
      assert(nov.count() > phase1MonitorRows, "monitor silent after restart")
      val novTotals = nov.groupBy("shard").agg(sum("n_new").as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val admittedTexts = base.map(_._3) ++ Seq(fresh11, fresh12, doc21)
      val want = exactDistinctGrams(admittedTexts)
      // direction is the contract: a bloom can only UNDER-count novelty
      // (false positives — with this seed exactly one fires), and lost
      // state at the restart would OVER-count by re-seeing every phase-1
      // gram — so <= per shard plus a tiny total deficit bound is the
      // exact-replay certification, and any overshoot is a restart bug
      for ((s, n) <- novTotals)
        assert(n <= want.getOrElse(s, 0L),
          s"shard $s OVER-counted novelty ($n > ${want.getOrElse(s, 0L)}) — " +
            "bloom state was not restored across the restart")
      val deficit = want.map { case (s, n) => n - novTotals.getOrElse(s, 0L) }.sum
      assert(deficit <= 2L,
        s"novelty deficit $deficit exceeds the FP allowance:\n" +
          s"got  $novTotals\nwant $want")
      // the planted cross-restart overlap was real: doc 21 shares grams
      // with doc 0, so the equality above genuinely certifies that the
      // restored bloom state suppressed them
      val overlap = exactDistinctGrams(Seq(base(0)._3)).keySet
        .intersect(exactDistinctGrams(Seq(doc21)).keySet)
      val shared = texts2grams(base(0)._3).intersect(texts2grams(doc21))
      assert(shared.size >= 3, s"planted overlap too small: $shared")
      assert(overlap.nonEmpty)
    }
  }

  private def texts2grams(t: String): Set[Long] =
    Seq(t).toDF("text")
      .select(explode(graft.functions.TextFunctions
        .distinct_shingles(col("text"), 3)).as("sh"))
      .select(xxhash64(col("sh")).as("h"))
      .as[Long].collect().toSet
}
