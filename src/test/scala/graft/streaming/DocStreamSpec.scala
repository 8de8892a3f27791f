package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming document dedup driven synchronously: docs split across two
  * parquet files (two micro-batches), near-dups planted both inside one
  * batch and across batches — both must be dropped, distinct docs kept.
  */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(13)
  // wide vocab: random docs must be far apart in SimHash space, so only
  // the planted reorderings collide
  private val vocab = Vector.tabulate(200)(i => s"w$i")
  private def doc(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  private def ts(min: Int) = Timestamp.valueOf(f"2024-06-01 10:$min%02d:00")

  /** transformWithState paths require the RocksDB state store; set it for
    * the block and restore the previous provider after. */
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

  private def mkSource(): (String, Set[Long], Set[Long]) = {
    val base = (0 until 20).map(i => (i.toLong, ts(i), doc(40)))
    // near-dups by token REORDERING: SimHash is bag-of-tokens, so the
    // signature is bit-identical (hamming 0, same bucket — deterministic
    // drop) while the text differs (exact dedup must keep them)
    def reorder(t: String) = t.split(" ").reverse.mkString(" ")
    val inBatchDup = (100L, ts(21), reorder(base(0)._3))
    val crossBatchDup = (200L, ts(22), reorder(base(5)._3))
    val exactDup = (300L, ts(23), base(7)._3)
    assert(inBatchDup._3 != base(0)._3 && crossBatchDup._3 != base(5)._3)
    val dir = tmpDir("docs-src")
    // file 1: first 10 originals + the in-batch near-dup of doc 0
    (base.take(10) :+ inBatchDup).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // FileStreamSource orders pending files by modification time; pin
    // file 1 strictly earlier so batch order can't flip on an mtime tie
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val t0 = System.currentTimeMillis() - 60000
    parts.foreach(f => assert(f.setLastModified(t0)))
    // file 2: remaining originals + cross-batch near-dup + exact dup
    (base.drop(10) :+ crossBatchDup :+ exactDup).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val all = base.map(_._1).toSet
    (dir, all, Set(100L, 200L, 300L))
  }

  test("streaming near-dup dedup drops planted dups within and across batches") {
    val (dir, originals, dups) = mkSource()
    val q = DocStream.nearDupFiltered(spark, DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("neardup").select("doc_id").as[Long].collect().toSet
    assert((dups -- kept) === dups, s"dups not dropped: ${dups intersect kept}")
    // every original is either kept or (rarely) a random near-collision;
    // all planted originals must survive at hamming > 3 from each other
    assert(originals.subsetOf(kept), s"originals dropped: ${originals -- kept}")
  }

  test("bucket state survives an idle micro-batch (timeout is event-time, not epoch)") {
    // 3 batches: originals / unrelated traffic (advances the watermark —
    // the round-2 bug purged idle buckets here because their timeout was
    // pinned to the pre-batch watermark = epoch) / a near-dup of batch 1
    // only ~25 min of event time later, which must still be dropped
    val dir = tmpDir("docs-ttl")
    def write(rows: Seq[(Long, Timestamp, String)], mtime: Long): Unit = {
      val before = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).toSet
      rows.toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !before.contains(f))
        .foreach(f => assert(f.setLastModified(mtime)))
    }
    val t0 = System.currentTimeMillis() - 180000
    val original = (1L, ts(0), doc(40))
    write(Seq(original), t0)
    write((50 until 60).map(i => (i.toLong, ts(20), doc(40))), t0 + 60000)
    write(Seq((900L, ts(25), original._3.split(" ").reverse.mkString(" "))), t0 + 120000)
    val q = DocStream.nearDupFiltered(spark, DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("ttl")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("ttl").select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L))
    assert(!kept.contains(900L), "near-dup emitted: batch-1 state was purged early")
  }

  test("MinHash path catches token-substituted near-dups SimHash misses, cross-batch") {
    // adversarial pair search (fully deterministic): substitute the last 2
    // tokens of a 40-token doc with fresh vocabulary; accept the first
    // candidate where (a) SimHash hamming > 3 — the SimHash path's radius
    // provably misses it, (b) the MinHash anchor band agrees and ≥ 60% of
    // signature slots agree — the MinHash path provably drops it
    def sim(t: String): Long = graft.functions.SimHashUtil
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), 60)
    def sig(t: String): Seq[String] = {
      val a = graft.functions.MinHashUtil.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3, 12)
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    def agree(a: Seq[String], b: Seq[String]): Int = a.zip(b).count(x => x._1 == x._2)
    val found = (0 until 50).iterator.map { i =>
      val base = doc(40)
      val mod = base.split(" ").dropRight(2).mkString(" ") + s" sub${i}a sub${i}b"
      (base, mod)
    }.find { case (base, mod) =>
      java.lang.Long.bitCount(sim(base) ^ sim(mod)) > 3 &&
        sig(base).take(2) == sig(mod).take(2) &&
        agree(sig(base), sig(mod)) >= 8
    }
    assert(found.isDefined, "no adversarial pair in 50 candidates — retune the generator")
    val (base, mod) = found.get
    val dir = tmpDir("docs-mh")
    Seq((1L, ts(0), base), (2L, ts(1), doc(40)))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val t0 = System.currentTimeMillis() - 60000
    parts.foreach(f => assert(f.setLastModified(t0)))
    Seq((3L, ts(2), mod), (4L, ts(3), doc(40)))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(dir)

    // the SimHash path KEEPS the substituted doc (hamming > 3 by search)...
    val qs = DocStream.nearDupFiltered(spark, DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("mh_simhash").outputMode("append").start()
    try qs.processAllAvailable() finally qs.stop()
    val simKept = spark.table("mh_simhash").select("doc_id").as[Long].collect().toSet
    assert(simKept.contains(3L), "SimHash unexpectedly caught the substitution")
    // ...the MinHash path DROPS it, across batches, and keeps the rest
    val qm = DocStream.minhashNearDupFiltered(spark, DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("mh_minhash").outputMode("append").start()
    try qm.processAllAvailable() finally qm.stop()
    val mhKept = spark.table("mh_minhash").select("doc_id").as[Long].collect().toSet
    assert(mhKept === Set(1L, 2L, 4L), s"got $mhKept")
  }

  test("multi-probe catches a dup the single-probe anchor band misses") {
    // adversarial pair search (deterministic): a near-dup whose ANCHOR
    // band (slots 0-1) disagrees — single-probe provably keeps it — but
    // whose band 1 or 2 (slots 2-3 / 4-5) agrees and ≥ 60% of slots agree
    // overall, so 3-band multi-probe provably drops it
    def sig(t: String): Seq[String] = {
      val a = graft.functions.MinHashUtil.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3, 12)
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    def agree(a: Seq[String], b: Seq[String]): Int = a.zip(b).count(x => x._1 == x._2)
    def band(s: Seq[String], i: Int): Seq[String] = s.slice(2 * i, 2 * i + 2)
    val found = (0 until 200).iterator.map { i =>
      val base = doc(40)
      val mod = base.split(" ").dropRight(2).mkString(" ") + s" mp${i}a mp${i}b"
      (base, mod)
    }.find { case (base, mod) =>
      val (sb, sm) = (sig(base), sig(mod))
      band(sb, 0) != band(sm, 0) &&
        (band(sb, 1) == band(sm, 1) || band(sb, 2) == band(sm, 2)) &&
        agree(sb, sm) >= 8
    }
    assert(found.isDefined, "no anchor-miss pair in 200 candidates — retune the generator")
    val (base, mod) = found.get
    val dir = tmpDir("docs-mp")
    Seq((1L, ts(0), base), (2L, ts(1), doc(40)))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val t0 = System.currentTimeMillis() - 60000
    parts.foreach(f => assert(f.setLastModified(t0)))
    Seq((3L, ts(2), mod), (4L, ts(3), doc(40)))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(dir)

    // single-probe keeps the dup (anchor band disagrees by construction)...
    val q1 = DocStream.minhashNearDupFiltered(spark, DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("mp_single").outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()
    val single = spark.table("mp_single").select("doc_id").as[Long].collect().toSet
    assert(single.contains(3L), "single-probe unexpectedly caught the anchor-miss dup")
    // ...multi-probe (3 bands) drops it and keeps everything else. The
    // chain runs on transformWithState with an output event-time column,
    // so the default stateful-correctness check stays ENABLED — no
    // session-wide safety opt-out (round-8 verdict item). Without the
    // RocksDB provider it must fail fast with guidance:
    intercept[IllegalStateException] {
      DocStream.minhashNearDupFilteredMultiProbe(spark, DocStream.read(spark, dir))
    }
    assert(spark.conf.get(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
      "true").toBoolean, "the correctness check must remain at its default")
    val multi = withRocksDb {
      val q2 = DocStream.minhashNearDupFilteredMultiProbe(spark, DocStream.read(spark, dir))
        .writeStream.format("memory").queryName("mp_multi").outputMode("append").start()
      try q2.processAllAvailable() finally q2.stop()
      spark.table("mp_multi").select("doc_id").as[Long].collect().toSet
    }
    assert(multi === Set(1L, 2L, 4L), s"got $multi")
  }

  test("multi-probe: an in-batch replayed doc_id survives exactly once") {
    // the same (doc_id, text) row twice in ONE micro-batch — the replay
    // shape of an at-least-once source. The second copy matches the
    // first's just-inserted signatures in every band; without the
    // in-batch collapse its all-dup votes would veto the first copy's
    // clean votes at the union and the document would vanish entirely
    val dir = tmpDir("docs-mp-replay")
    val d = doc(40)
    Seq((1L, ts(0), d), (1L, ts(0), d), (2L, ts(1), doc(40)))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(dir)
    val kept = withRocksDb {
      val q = DocStream.minhashNearDupFilteredMultiProbe(spark, DocStream.read(spark, dir))
        .writeStream.format("memory").queryName("mp_replay").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("mp_replay").select("doc_id").as[Long].collect().toSeq
    }
    assert(kept.sorted === Seq(1L, 2L), s"got $kept")
  }

  test("transformWithState MinHash dedup matches the flatMapGroupsWithState form") {
    // cross-batch exact dup (signature agreement 12/12) + distinct docs;
    // both implementations must keep/drop identically
    val dir = tmpDir("docs-mh-tws")
    val base = (0 until 8).map(i => (i.toLong, ts(i), doc(40)))
    base.take(4).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val t0 = System.currentTimeMillis() - 60000
    parts.foreach(f => assert(f.setLastModified(t0)))
    (base.drop(4) :+ ((99L, ts(9), base(1)._3)))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(dir)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val twsKept = try {
      val q = DocStream.minhashNearDupFilteredTws(spark, DocStream.read(spark, dir))
        .writeStream.format("memory").queryName("mh_tws").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("mh_tws").select("doc_id").as[Long].collect().toSet
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    val q2 = DocStream.minhashNearDupFiltered(spark, DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("mh_fmgs").outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val fmgsKept = spark.table("mh_fmgs").select("doc_id").as[Long].collect().toSet
    assert(twsKept === fmgsKept)
    assert(!twsKept.contains(99L), "cross-batch dup not dropped by timer-based state")
    assert(base.map(_._1).toSet.subsetOf(twsKept))
  }

  test("docs shorter than the shingle width pass through all MinHash paths alive") {
    // a 2-token doc has NO 3-shingle signature (null array) — it must be
    // kept, bypassing the near-dup state, and must NOT kill the query
    // (a null sig stored in keyed state NPEs the dup check)
    val dir = tmpDir("docs-short")
    Seq((1L, ts(0), "hello world"), (2L, ts(1), doc(40)),
        (3L, ts(2), "hi"), (4L, ts(3), doc(40)))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(dir)
    val q1 = DocStream.minhashNearDupFiltered(spark, DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("short_fmgs").outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.table("short_fmgs").select("doc_id").as[Long].collect().toSet
      === Set(1L, 2L, 3L, 4L))
    val multi = withRocksDb {
      val q2 = DocStream.minhashNearDupFilteredMultiProbe(spark, DocStream.read(spark, dir))
        .writeStream.format("memory").queryName("short_mp").outputMode("append").start()
      try q2.processAllAvailable() finally q2.stop()
      spark.table("short_mp").select("doc_id").as[Long].collect().toSet
    }
    assert(multi === Set(1L, 2L, 3L, 4L))
  }

  test("dedupIngest stream: exactly-once admission across a query restart") {
    // two micro-batches before a restart, one after; near/exact dups of
    // already-ADMITTED docs must drop, and re-running the stream from the
    // same checkpoint must not double anything (batch markers + idempotent
    // per-batch sinks)
    val dir = tmpDir("docs-ingest-src")
    val base = (0 until 8).map(i => (i.toLong, ts(i), doc(40)))
    base.toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val t0 = System.currentTimeMillis() - 120000
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.setLastModified(t0)))
    // file 2: an exact dup of doc 1 + two fresh docs (ids stay monotone)
    (Seq((10L, ts(8), base(1)._3)) ++ Seq((11L, ts(9), doc(40)), (12L, ts(10), doc(40))))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(dir)
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .filter(_.lastModified() > t0).foreach(f => assert(f.setLastModified(t0 + 30000)))
    val root = tmpDir("docs-ingest-out")
    val idx = s"$root/idx"; val out = s"$root/admitted"; val ckpt = s"$root/ckpt"
    val q = DocStream.dedupIngest(
      DocStream.read(spark, dir).select("doc_id", "text"), idx, out, ckpt, 0.5)
    try q.processAllAvailable() finally q.stop()
    def admitted() = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    val afterTwo = admitted()
    assert(afterTwo === (base.map(_._1).toSet ++ Set(11L, 12L)), s"got $afterTwo")
    // restart from the same checkpoint with one more file: the processed
    // batches are not re-run, the new one admits only the fresh doc
    (Seq((20L, ts(11), base(2)._3), (21L, ts(12), doc(40))))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(dir)
    val q2 = DocStream.dedupIngest(
      DocStream.read(spark, dir).select("doc_id", "text"), idx, out, ckpt, 0.5)
    try q2.processAllAvailable() finally q2.stop()
    assert(admitted() === afterTwo + 21L, s"got ${admitted()}")
    // the index holds signatures for exactly the admitted docs
    val indexed = graft.ops.Dedup.readSignatureIndex(spark, idx)
      .select("id").distinct().as[Long].collect().toSet
    assert(indexed === afterTwo + 21L)
  }

  test("streaming exact dedup drops only identical content") {
    val (dir, originals, _) = mkSource()
    val q = DocStream.exactDeduped(DocStream.read(spark, dir))
      .writeStream.format("memory").queryName("exactdedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("exactdedup").select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(300L)) // exact copy dropped
    assert(kept.contains(100L) && kept.contains(200L)) // near-dups differ -> kept
    assert(originals.subsetOf(kept))
  }

  test("sketch monitor: per-batch KLL appends, exactly-once under replay") {
    val dir = tmpDir("docs-kll")
    val sketchPath = tmpDir("kll-art") + "/sketches"
    val ckpt = tmpDir("kll-ckpt")
    // three single-file micro-batches (maxFilesPerTrigger=1), doc length
    // = text char length; plant known lengths via exact-char texts
    def textOf(len: Int) = "x" * len
    (0 until 3).foreach { b =>
      (0 until 50).map { i =>
        ((b * 50 + i).toLong, ts(b), textOf(1 + (b * 50 + i) % 300))
      }.toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(dir)
    }
    val q = DocStream.sketchMonitorIngest(DocStream.read(spark, dir),
      sketchPath, ckpt)
    try q.processAllAvailable() finally q.stop()
    val served = DocStream.corpusLengthQuantiles(spark, sketchPath,
      Seq(0.5)).collect().head
    assert(served.getLong(0) == 150L, "merged exact count must cover all batches")
    val p50 = served.getDouble(1)
    assert(p50 > 0 && p50 <= 300, s"p50=$p50")
    // a crash-replay of an already-committed micro-batch must be a no-op
    val replay = (0 until 50).map(i => (i.toLong, ts(0), textOf(999)))
      .toDF("doc_id", "ts", "text")
    DocStream.sketchBatch(replay, 0L, sketchPath, 200)
    val after = DocStream.corpusLengthQuantiles(spark, sketchPath,
      Seq(0.5)).collect().head
    assert(after.getLong(0) == 150L, "replayed batch must not double-count")
  }

  test("streaming novelty monitor: Bloom state recognizes repeats, replay scores zero") {
    withRocksDb {
      val dir = tmpDir("novelty-src")
      val b1 = (0 until 10).map(i => (i.toLong, ts(i), doc(40)))
      b1.toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(dir)
      val t0 = System.currentTimeMillis() - 120000
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => assert(f.setLastModified(t0)))
      val q = NoveltyStream.noveltyStats(spark, DocStream.read(spark, dir))
        .writeStream.format("memory").queryName("novelty")
        .outputMode("append").start()
      def totals(): (Long, Long) = {
        val r = spark.table("novelty")
          .agg(sum(col("n_grams")), sum(col("n_new"))).collect().head
        (r.getLong(0), r.getLong(1))
      }
      try {
        q.processAllAvailable()
        val (g1, n1) = totals()
        // first batch: every distinct gram is new by definition
        assert(g1 > 0 && n1 === g1, s"batch1 g=$g1 new=$n1")
        // batch 2: five exact repeats of batch-1 docs + five fresh docs —
        // repeats must contribute ZERO new grams
        val b2 = b1.take(5) ++ (20 until 25).map(i => (i.toLong, ts(i), doc(40)))
        val f2 = b2.toDF("doc_id", "ts", "text")
        f2.coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
        val (g2, n2) = totals()
        val (dg2, dn2) = (g2 - g1, n2 - n1)
        assert(dg2 > 0 && dn2 > 0 && dn2 < dg2,
          s"batch2 grams=$dg2 new=$dn2 — repeats should halve novelty")
        // batch 3: an exact replay of batch 2 — novelty must be EXACTLY 0
        // (every gram's bits are set; Bloom can only under-count)
        f2.coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
        val (g3, n3) = totals()
        assert(g3 - g2 === dg2 && n3 - n2 === 0L,
          s"replayed batch scored ${n3 - n2} novel grams")
      } finally q.stop()
    }
  }
  // NOTE on the equality assert below: the union of per-batch emissions
  // is in general only RECALL-PRESERVING (a superset of the full
  // recompute — the cumulative df mask only grows, and pairs emitted
  // before a shared hash crossed maxDf are never retracted; DedupSpec
  // pins that divergence explicitly). Equality holds HERE because no
  // hash in this corpus ever crosses the default maxDf=50.
  test("winnowIngest stream: per-batch span candidates, exactly-once " +
      "across a restart, union equals the full recompute (no df crossing)") {
    val dir = tmpDir("docs-winnow-src")
    // shared 12-token span between docs 1 and 3 (>= k+w-1 = 7 tokens →
    // guaranteed shared fingerprints); everything else is random
    val span = doc(12)
    val base = Seq(
      (0L, ts(0), doc(30)),
      (1L, ts(1), s"${doc(10)} $span ${doc(8)}"),
      (2L, ts(2), doc(30)),
      (3L, ts(3), s"$span ${doc(15)}"))
    base.toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val t0 = System.currentTimeMillis() - 120000
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.setLastModified(t0)))
    // file 2: doc 10 repeats the span (must pair with BOTH earlier docs
    // via the index — cross-batch), doc 11 is fresh
    Seq((10L, ts(4), s"${doc(5)} $span"), (11L, ts(5), doc(30)))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .filter(_.lastModified() > t0).foreach(f => assert(f.setLastModified(t0 + 30000)))
    val root = tmpDir("docs-winnow-out")
    val idx = s"$root/idx"; val out = s"$root/cand"; val ckpt = s"$root/ckpt"
    val q = DocStream.winnowIngest(
      DocStream.read(spark, dir).select("doc_id", "text"), idx, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    def cands() = spark.read.parquet(out)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val afterTwo = cands()
    assert(afterTwo.contains((1L, 3L)))
    assert(afterTwo.contains((1L, 10L)) && afterTwo.contains((3L, 10L)))
    // restart from the same checkpoint with one more file: processed
    // batches are not re-run (their candidate sets unchanged), the new
    // batch pairs only against index ∪ itself
    Seq((20L, ts(6), s"$span ${doc(3)}"))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val q2 = DocStream.winnowIngest(
      DocStream.read(spark, dir).select("doc_id", "text"), idx, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val afterThree = cands()
    assert(afterThree -- afterTwo === Set((1L, 20L), (3L, 20L), (10L, 20L)))
    // the union of per-batch emissions equals the full recompute (every
    // pair lands exactly once — when its greater endpoint's batch runs)
    val allFp = graft.ops.Dedup.winnowFingerprints(
      spark.read.parquet(dir).select(col("doc_id"), col("text")),
      "doc_id", "text")
    val full = allFp.select(col("h"), col("id").as("id_a"))
      .join(allFp.select(col("h"), col("id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(afterThree === full)
  }

  test("bm25Ingest stream: exactly-once posting ingest across a restart, " +
      "served scores equal a full rebuild of the admitted corpus") {
    val dir = tmpDir("docs-bm25-src")
    val t1 = s"planted0 planted1 ${doc(10)}"
    val file1 = Seq(
      (0L, ts(0), t1),
      (1L, ts(1), s"planted0 ${doc(12)}"),
      (2L, ts(2), s"planted1 planted1 ${doc(8)}"),
      // exact within-batch dup: the admit step keeps the min id only
      (100L, ts(3), t1))
    file1.toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val t0 = System.currentTimeMillis() - 120000
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.setLastModified(t0)))
    Seq((10L, ts(4), s"planted0 planted2 ${doc(9)}"),
        (11L, ts(5), s"planted2 ${doc(7)}"))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .filter(_.lastModified() > t0).foreach(f => assert(f.setLastModified(t0 + 30000)))
    val root = tmpDir("docs-bm25-out")
    val idx = s"$root/idx"; val ckpt = s"$root/ckpt"
    val q = DocStream.bm25Ingest(DocStream.read(spark, dir), idx, ckpt)
    try q.processAllAvailable() finally q.stop()
    val queries = Seq((1L, Seq("planted0", "planted1")), (2L, Seq("planted2")))
    def served() = graft.ops.TextRank.bm25TopKIndexed(
      graft.ops.TextRank.readPostingIndex(spark, idx), queries, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    def rebuilt(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextRank.bm25TopK(df, queries, "doc_id", "text", k = 5)
        .as[(Long, Long, Long, Long)].collect().toSet
    def admitted() = spark.read.parquet(dir)
      .filter(col("doc_id") =!= 100L).select(col("doc_id"), col("text"))
    // TextRankSpec parity extended to the STREAMED index: served scores
    // equal the full-corpus recompute over the admitted docs, bit for bit
    val s1 = served()
    assert(s1 === rebuilt(admitted()))
    assert(!s1.exists(_._3 == 100L),
      "the within-batch exact dup must not be posted")
    assert(s1.exists(_._3 == 0L), "its min-id representative must be")
    // crash-replay: foreachBatch re-delivers a batch after a failure —
    // the committed marker makes it a no-op (postings/sentinels do not
    // double, served scores unchanged)
    val before = graft.ops.TextRank.readPostingIndex(spark, idx).count()
    graft.ops.TextRank.postingIngestBatch(
      file1.toDF("doc_id", "ts", "text"), 0L, idx)
    assert(graft.ops.TextRank.readPostingIndex(spark, idx).count() === before)
    assert(served() === s1)
    // restart from the same checkpoint with one more file: processed
    // batches are not re-ingested, the new batch appends exactly once,
    // and the served view equals a full rebuild of the grown corpus
    Seq((20L, ts(6), s"planted1 planted2 ${doc(6)}"))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val q2 = DocStream.bm25Ingest(DocStream.read(spark, dir), idx, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(served() === rebuilt(admitted()))
  }

  test("curateIngest: composed funnel — one admit decision drives all " +
      "three indexes, exactly-once across restart and a mid-composition " +
      "crash, admit set equals the batch stage composition") {
    val dir = tmpDir("docs-curate-src")
    val span = doc(12)
    // quality gate: doc(40) scores 0.75 (length/ttr/chars-per-token bands
    // pass, no stopwords), a 3-token doc scores 0.5 — minQuality 0.7
    // separates them deterministically. Dedup victims are EXACT copies
    // (est_jaccard 1.0 ≥ threshold 0.6) of ADMITTED originals only, so
    // the streamed keep-first equals the one-shot batch composition (no
    // transitive chains across batch boundaries). Docs 1/3/13 share a
    // 12-token span (≥ k+w−1 → guaranteed winnow fingerprints).
    val d0 = doc(40); val d2 = doc(40)
    val file1 = Seq(
      (0L, ts(0), d0),
      (1L, ts(1), s"${doc(10)} $span ${doc(8)}"),
      (2L, ts(2), d2),
      (3L, ts(3), s"$span ${doc(15)}"),
      (4L, ts(4), doc(40)),
      (5L, ts(5), doc(40)),
      (6L, ts(6), "just three tokens"), // gated: quality 0.5
      (7L, ts(7), d0)) // exact dup of doc 0 — dedup drops, in-batch
    file1.toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val t0 = System.currentTimeMillis() - 120000
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.setLastModified(t0)))
    val d11 = doc(40)
    Seq((10L, ts(8), d2), // exact dup of doc 2 — dedup drops, CROSS-batch
        (11L, ts(9), d11),
        (12L, ts(10), "more filler words"), // gated
        (13L, ts(11), s"$span ${doc(5)} ${doc(14)}"))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .filter(_.lastModified() > t0).foreach(f => assert(f.setLastModified(t0 + 30000)))
    val root = tmpDir("docs-curate-out")
    val ckpt = s"$root/ckpt"
    def ingest() = DocStream.curateIngest(DocStream.read(spark, dir),
      root, ckpt, minQuality = 0.7)
    val q = ingest()
    try q.processAllAvailable() finally q.stop()
    def admittedIds() = spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(admittedIds() === Set(0L, 1L, 2L, 3L, 4L, 5L, 11L, 13L),
      s"got ${admittedIds()}")
    // restart from the same checkpoint: processed batches are not re-run,
    // the new batch's dup drops against the committed index
    Seq((20L, ts(12), d11), (21L, ts(13), doc(40)))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val q2 = ingest()
    try q2.processAllAvailable() finally q2.stop()
    val admitSet = admittedIds()
    assert(admitSet === Set(0L, 1L, 2L, 3L, 4L, 5L, 11L, 13L, 21L))
    // ONE admit decision: every index holds exactly the admitted docs
    assert(graft.ops.Dedup.readSignatureIndex(spark, s"$root/mh_idx")
      .select("id").distinct().as[Long].collect().toSet === admitSet)
    assert(graft.ops.TextRank.readPostingIndex(spark, s"$root/bm25_idx")
      .filter(col("term").isNotNull)
      .select("doc_id").distinct().as[Long].collect().toSet === admitSet)
    assert(graft.ops.Dedup.readWinnowIndex(spark, s"$root/win_idx")
      .select("id").distinct().as[Long].collect().toSet
      // winnow index covers admitted docs that HAVE fingerprints (≥ k
      // tokens — all of ours do)
      === admitSet)
    // per-batch funnel rows, exactly-once: (in, past-quality, admitted)
    val funnel = DocStream.curationFunnel(spark, root)
      .select("batch_id", "n_in", "n_gated", "n_admitted")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(funnel === Set((0L, 8L, 7L, 6L), (1L, 4L, 3L, 2L),
      (2L, 2L, 2L, 1L)), s"got $funnel")
    // span candidates equal the full recompute over the ADMITTED corpus
    // (no hash crosses maxDf here — the winnowIngest equality regime)
    def cands() = spark.read.parquet(s"$root/span_cand")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands() === Set((1L, 3L), (1L, 13L), (3L, 13L)), s"got ${cands()}")
    // BM25 serves from the composed index with full-rebuild parity
    val queries = Seq((1L, span.split(" ").distinct.take(2).toSeq))
    def served() = graft.ops.TextRank.bm25TopKIndexed(
      graft.ops.TextRank.readPostingIndex(spark, s"$root/bm25_idx"),
      queries, k = 5).as[(Long, Long, Long, Long)].collect().toSet
    val adm = spark.read.parquet(s"$root/admitted")
      .select(col("doc_id"), col("text"))
    assert(served() === graft.ops.TextRank.bm25TopK(adm, queries,
      "doc_id", "text", k = 5).as[(Long, Long, Long, Long)].collect().toSet)
    // batch-composition parity (the q244 stage rules over the same
    // delivery): quality gate over everything delivered, then the same
    // keep-first dedup as ONE batch — identical admit set
    val broot = tmpDir("docs-curate-batch-equiv")
    val en = graft.ops.TextOps.langProfiles.head._2
    graft.ops.Dedup.ingestBatch(
      spark.read.parquet(dir)
        .filter(graft.ops.TextOps.qualityScore(col("text"), en) >= 0.7)
        .select(col("doc_id"), col("text")),
      0L, s"$broot/idx", s"$broot/adm", 0.6)
    assert(spark.read.parquet(s"$broot/adm")
      .select("doc_id").as[Long].collect().toSet === admitSet)
    // replay of a COMMITTED batch is a no-op end to end
    val idxCounts = Seq(s"$root/mh_idx", s"$root/win_idx", s"$root/bm25_idx")
    def stateSig() = (admittedIds(), funnelRows(), cands(),
      idxCounts.map(p => graft.ops.BatchIndex.committedFileCount(spark, p)))
    def funnelRows() = DocStream.curationFunnel(spark, root).count()
    val before = stateSig()
    DocStream.curateBatch(file1.toDF("doc_id", "ts", "text"), 0L, root,
      minQuality = 0.7)
    assert(stateSig() === before)
    // mid-composition CRASH: stage 2 (dedup admit) completed for batch 3,
    // then the loop died before winnow/bm25/funnel — the retry must
    // complete the remaining stages exactly once and agree on the admit
    val b3 = Seq((30L, ts(14), d11), (31L, ts(15), doc(40)))
      .toDF("doc_id", "ts", "text")
    graft.ops.Dedup.ingestBatch(b3, 3L, s"$root/mh_idx", s"$root/admitted",
      0.6, "doc_id", "text")
    DocStream.curateBatch(b3, 3L, root, minQuality = 0.7)
    assert(admittedIds() === admitSet + 31L)
    assert(DocStream.curationFunnel(spark, root)
      .filter(col("batch_id") === 3L)
      .select("n_in", "n_gated", "n_admitted")
      .as[(Long, Long, Long)].collect().toSeq === Seq((2L, 2L, 1L)))
    assert(graft.ops.TextRank.readPostingIndex(spark, s"$root/bm25_idx")
      .filter(col("term").isNotNull)
      .select("doc_id").distinct().as[Long].collect().toSet === admitSet + 31L)
  }

}
