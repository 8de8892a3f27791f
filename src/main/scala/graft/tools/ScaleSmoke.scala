package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops._

/** Scale smoke (dev tool): synthesizes a corpus ~10-40× the sf0.1 gate
  * tables into /tmp and drives the heavy operators end-to-end, printing
  * per-stage wall times. Catches super-linear blowups (candidate
  * explosions, state growth, driver collects) that the small-SF gates
  * can't see. Not part of the test suite — run with
  * `sbt "runMain graft.tools.ScaleSmoke [nDocs] [nVecs]"`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val nVecs = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = GraftSession.local("graft-scale-smoke", 32)
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SMOKE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode(SaveMode.Overwrite).format("noop").save()

    // ---- documents: 5% exact dups (%20==7) + 5% true near-dups
    // (%20==13: cluster-base text with one token appended — Jaccard ≈
    // 0.95, shingle sets high-but-not-identical) ----
    val docsPath = "/tmp/graft_scale/docs"
    time(s"gen $nDocs docs") {
      def baseText(idCol: org.apache.spark.sql.Column) =
        concat_ws(" ", (0 until 60).map(i =>
          concat(lit("w"), pmod(xxhash64(idCol * 1000 + i), lit(5000)))): _*)
      val clusterBase = col("doc_id") - (col("doc_id") % 20)
      spark.range(nDocs).select(col("id").as("doc_id"))
        .withColumn("text",
          when(pmod(col("doc_id"), lit(20)) === 7, baseText(clusterBase))
            .when(pmod(col("doc_id"), lit(20)) === 13,
              concat(baseText(clusterBase), lit(" extraTok")))
            .otherwise(baseText(col("doc_id"))))
        .write.mode(SaveMode.Overwrite).parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)
    time("exact dedup")(noop(Dedup.exact(docs, "doc_id", "text")))
    time("minhash candidates")(noop(Dedup.minhashCandidates(docs, "doc_id", "text")))
    time("minhash candidates FAST")(noop(Dedup.minhashCandidatesFast(docs, "doc_id", "text")))
    time("simhash")(noop(Dedup.simhashMd5(docs, "doc_id", "text", 60)))
    time("full curation")(noop(Curation.curate(docs, "doc_id", "text")))
    time("pack sequences")(noop(TrainingMix.packSequences(docs, "doc_id", "text", 4096L, 64)))
    time("stratified sample")(noop(TrainingMix.stratifiedSample(
      docs.withColumn("s", pmod(col("doc_id"), lit(5)).cast("string")),
      "doc_id", "s", Map("0" -> 0.5), 0.2)))

    time("repetition stats")(noop(docs.select(col("doc_id"),
      TextOps.repetitionStats(col("text")).as("r")).select(col("doc_id"), col("r.*"))))
    time("token novelty")(noop(TextOps.tokenNovelty(docs, "doc_id", "text")))
    time("per-group heavy hitters") {
      // the SQL-callable sketch per synthetic source (nDocs/200 groups):
      // ≤ k counter pairs per group per partial regardless of token volume
      noop(docs
        .withColumn("source", pmod(col("doc_id"), lit(200)).cast("string"))
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"))
        .agg(graft.functions.TextFunctions.heavy_hitters(col("tok"), 30).as("hh"))
        .select(col("source"), col("hh.n"), map_keys(col("hh.items"))))
    }
    time("incremental dedup (index)") {
      // cross-run mode: first half indexed once, second half deduped
      // against index ∪ self — per-ingest work scales with the batch
      val idxPath = s"/tmp/graft_scale/sigidx_${nDocs}"
      graft.core.Fs.delete(spark, idxPath)
      val idx = Dedup.signatureIndexArtifact(
        docs.filter(col("doc_id") < nDocs / 2), "doc_id", "text", idxPath)
      noop(Dedup.minhashCandidatesIncremental(
        docs.filter(col("doc_id") >= nDocs / 2), "doc_id", "text", idx))
    }
    time("connected components") {
      // candidate graph of the planted clusters: components are ~2-node
      // (the %20==7 exact dup collapses in signatures with its base);
      // verifies rounds stay O(diameter), not O(n)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
        .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
      noop(Dedup.connectedComponents(cand))
    }

    // streaming near-dup dedup over the same corpus: 4 micro-batches,
    // event-time-bounded bucket state; prints rows kept (dups dropped)
    time("streaming near-dup dedup") {
      val streamDir = "/tmp/graft_scale/docs_stream"
      graft.core.Fs.delete(spark, streamDir)
      docs.select(col("doc_id"),
          (lit(java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime / 1000)
            + pmod(col("doc_id"), lit(3600))).cast("timestamp").as("ts"),
          col("text"))
        .repartition(4)
        .write.mode(SaveMode.Overwrite).parquet(streamDir)
      val q = graft.streaming.DocStream.nearDupFiltered(spark,
          graft.streaming.DocStream.read(spark, streamDir))
        .writeStream.format("noop")
        .option("checkpointLocation", "/tmp/graft_scale/ckpt_" + System.nanoTime())
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    time("streaming multi-probe near-dup") {
      // transformWithState chain — needs the RocksDB state store; restore
      // the PREVIOUS provider value after (not a hardcoded default)
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val q = graft.streaming.DocStream.minhashNearDupFilteredMultiProbe(spark,
            graft.streaming.DocStream.read(spark, "/tmp/graft_scale/docs_stream"))
          .writeStream.format("noop")
          .option("checkpointLocation", "/tmp/graft_scale/ckpt_" + System.nanoTime())
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    // as-of join at scale: purchases against 9× the prior events, both
    // forms — the native merge exec must beat (or match) the union/window
    // form while producing identical results
    time("asof window form") {
      val n = nDocs
      val ev = spark.range(n).select(
        col("id").as("event_id"), pmod(col("id"), lit(n / 50)).as("user_id"),
        (lit(1700000000L) + pmod(xxhash64(col("id")), lit(86400 * 30))).cast("timestamp").as("ts"),
        pmod(col("id"), lit(10)).as("kind"))
      val l = ev.filter(col("kind") === 0).drop("kind")
      val r = ev.filter(col("kind") =!= 0)
      noop(AsOf.joinPrior(l, r, Seq("user_id"), "ts", "ts", Seq("event_id")))
    }
    time("asof native exec") {
      val n = nDocs
      val ev = spark.range(n).select(
        col("id").as("event_id"), pmod(col("id"), lit(n / 50)).as("user_id"),
        (lit(1700000000L) + pmod(xxhash64(col("id")), lit(86400 * 30))).cast("timestamp").as("ts"),
        pmod(col("id"), lit(10)).as("kind"))
      val l = ev.filter(col("kind") === 0).drop("kind")
      val r = ev.filter(col("kind") =!= 0)
      noop(AsOf.joinPriorNative(l, r, Seq("user_id"), "ts", "ts", Seq("event_id")))
    }

    // ---- embeddings: 64-dim, clustered; 5% planted near-identical ----
    val vecsPath = "/tmp/graft_scale/vecs"
    time(s"gen $nVecs vecs") {
      spark.range(nVecs).select(col("id"),
        transform(sequence(lit(0), lit(63)), d =>
          (pmod(xxhash64(pmod(col("id"), lit(50)) * 100 + d), lit(1000)).cast("double") / 500.0 - 1.0 +
            pmod(xxhash64(col("id") * 64 + d), lit(100)).cast("double") / 500.0)
            .cast("float")).as("vec"))
        .write.mode(SaveMode.Overwrite).parquet(vecsPath)
    }
    val vecs = spark.read.parquet(vecsPath)
    // bucket density rule: bits ≈ log2(n / targetBucketRows)
    val bits = math.max(6, (math.log(nVecs / 30.0) / math.log(2)).round.toInt)
    time(s"lsh near-dup pairs (16x$bits)")(noop(
      Similarity.lshNearDupCandidates(vecs, nTables = 16, bitsPerTable = bits, threshold = 0.9)))
    time(s"lsh min-rep dedup (16x$bits)")(noop(
      Similarity.lshNearDupLosersMinRep(vecs, nTables = 16, bitsPerTable = bits, threshold = 0.9)))
    val cents = time("ivf train k=64")(
      Similarity.trainCentroids(vecs, 64, iters = 2, init = "sample"))
    val queries = vecs.filter(col("id") < 16).select(col("id").as("qid"), col("vec").as("qvec"))
    time("ivf topk nprobe=4")(noop(Similarity.ivfTopK(vecs, queries, 10, cents, nprobe = 4)))
    time("brute topk (baseline)")(noop(Similarity.bruteForceTopK(vecs, queries, 10)))

    // ---- media: every vector rendered as a 16×16 BMP, decoded, pooled,
    // hashed, near-dup-blocked — the full q65 pipeline at nVecs scale
    // (media payloads are ~0.8 KB each; the decode runs once thanks to
    // the persist barrier, which this smoke exists to prove at volume) ----
    time("media decode+phash+lsh") {
      import spark.implicits._
      val media = vecs.as[(Long, Seq[Float])].map { case (id, emb) =>
        val rgb = new Array[Byte](16 * 16 * 3)
        var p = 0
        while (p < 64) {
          val g = math.max(0L, math.min(255L,
            math.floor((emb(p).toDouble + 1.0) * 127.5).toLong)).toByte
          val by = (p / 8) * 2; val bx = (p % 8) * 2
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val off = ((by + dy) * 16 + (bx + dx)) * 3
              rgb(off) = g; rgb(off + 1) = g; rgb(off + 2) = g
              dx += 1
            }
            dy += 1
          }
          p += 1
        }
        Multimodal.MediaRow(id, "image", "bmp",
          Multimodal.Bmp.encode(16, 16, rgb), 16, 16, 0L)
      }
      val frames = Multimodal.decodeFrames(media, new Multimodal.BmpDecoder)(spark)
        .persist()
      val feats = Multimodal.extractFeatures(frames)(spark).toDF()
        .select(col("media_id").as("id"), col("feature").as("vec")).persist()
      noop(frames.map(f => Multimodal.phash(f)).toDF())
      noop(Similarity.lshNearDupCandidates(feats, nTables = 16,
        bitsPerTable = bits, dim = 64, threshold = 0.9))
      frames.unpersist(); feats.unpersist(): Unit
    }
    spark.stop()
  }
}
