package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BatchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def idx(name: String) = tmpDir(name) + "/index"

  test("append + read roundtrip; replayed commit is a no-op") {
    val path = idx("bi_replay")
    val b1 = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    BatchIndex.appendBatch(b1, path, 1L, "test v1")
    BatchIndex.appendBatch(b1, path, 1L, "test v1") // replay
    assert(BatchIndex.isCommitted(spark, path, 1L))
    assert(!BatchIndex.isCommitted(spark, path, 2L))
    val rows = BatchIndex.readCommitted(spark, path)
      .as[(Long, Long)].collect().sorted
    assert(rows.toSeq == Seq((1L, 10L), (2L, 20L)), "replay must not double rows")
  }

  test("crashed attempt's uncommitted files are invisible and cleaned on retry") {
    val path = idx("bi_crash")
    BatchIndex.appendBatch(Seq((1L, 1L)).toDF("id", "v"), path, 1L, "test v1")
    // simulate a crash mid-batch-2: prefixed data file present, NO marker
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = tmpDir("bi_stage")
    Seq((99L, 99L)).toDF("id", "v").write.mode("overwrite").parquet(stage)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, new org.apache.hadoop.fs.Path(path, "b2_" + part.getName))
    // serving sees only batch 1
    assert(BatchIndex.readCommitted(spark, path).count() == 1L)
    // retry of batch 2 lands its rows exactly once (the planted orphan dies)
    BatchIndex.appendBatch(Seq((2L, 2L)).toDF("id", "v"), path, 2L, "test v1")
    val rows = BatchIndex.readCommitted(spark, path)
      .as[(Long, Long)].collect().sorted
    assert(rows.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("meta fingerprint guard rejects incompatible appends") {
    val path = idx("bi_meta")
    BatchIndex.appendBatch(Seq((1L, 1L)).toDF("id", "v"), path, 1L, "k=16")
    val e = intercept[IllegalArgumentException] {
      BatchIndex.appendBatch(Seq((2L, 2L)).toDF("id", "v"), path, 2L, "k=32")
    }
    assert(e.getMessage.contains("k=16") && e.getMessage.contains("k=32"))
  }

  test("reading an empty index fails fast") {
    val e = intercept[IllegalArgumentException] {
      BatchIndex.readCommitted(spark, idx("bi_empty"))
    }
    assert(e.getMessage.contains("no committed data files"))
  }

  test("compact: rows and markers preserved, replay still skipped, fewer files") {
    val path = idx("bi_compact")
    (1L to 6L).foreach { b =>
      BatchIndex.appendBatch(Seq((b, b * 10)).toDF("id", "v"), path, b, "test v1")
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).count(_.endsWith(".parquet"))
    val before = dataFiles()
    BatchIndex.compact(spark, path, targetFiles = 2)
    assert(dataFiles() < before, s"compaction did not shrink: $before files")
    val rows = BatchIndex.readCommitted(spark, path)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(rows == (1L to 6L).map(b => (b, b * 10)).toSeq)
    // a late replay of a pre-compaction batch must STILL be a no-op
    BatchIndex.appendBatch(Seq((1L, 999L)).toDF("id", "v"), path, 1L, "test v1")
    assert(BatchIndex.readCommitted(spark, path).count() == 6L)
    // and new batches append normally after compaction
    BatchIndex.appendBatch(Seq((7L, 70L)).toDF("id", "v"), path, 7L, "test v1")
    assert(BatchIndex.readCommitted(spark, path).count() == 7L)
  }

  test("interrupted compaction swap is healed on the next entry") {
    val path = idx("bi_heal")
    BatchIndex.appendBatch(Seq((1L, 1L)).toDF("id", "v"), path, 1L, "test v1")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the two swap renames: index moved aside,
    // replacement never published
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".compact_old")))
    val rows = BatchIndex.readCommitted(spark, path) // heals first
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 1L)))
    assert(BatchIndex.isCommitted(spark, path, 1L))
  }

  test("ivfIngest postings: batch-proportional append, idempotent replay") {
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(4)(((i % 5) + 1).toFloat))).toDF("id", "vec")
    val cents = Array(
      (0L, Seq(1f, 1f, 1f, 1f)), (1L, Seq(5f, 5f, 5f, 5f)))
    val path = idx("bi_ivf")
    Similarity.ivfIngest(vecs.filter(col("id") < 20), path, cents, 1L)
    Similarity.ivfIngest(vecs.filter(col("id") >= 20), path, cents, 2L)
    Similarity.ivfIngest(vecs.filter(col("id") >= 20), path, cents, 2L)
    val out = Similarity.readIvfIndex(spark, path)
    assert(out.count() == 40L)
    assert(out.columns.toSet == Set("id", "cid", "batch_id"))
    // every posting's cid is a real codebook entry
    assert(out.filter(!col("cid").isin(0L, 1L)).count() == 0L)
  }

  test("soak: 200 appends on the auto-compaction cadence keep the " +
      "committed file count bounded, serve identically to a single-shot " +
      "build, and stay replay-safe across compactions") {
    // the 100 TB ingest loop runs thousands of appends with the
    // compactAbove cadence the serving indexes use (one compact whenever
    // the committed count crosses the threshold) — this drives the full
    // protocol through 200 cycles and pins the three lifecycle
    // invariants at soak length, not just one append deep
    val path = idx("bi_soak")
    val compactAbove = 16
    var maxFiles = 0
    (0 until 200).foreach { b =>
      BatchIndex.appendBatch(
        Seq((b.toLong, b * 10L)).toDF("id", "v").coalesce(1),
        path, b.toLong, "soak v1")
      if (BatchIndex.committedFileCount(spark, path) > compactAbove)
        BatchIndex.compact(spark, path)
      maxFiles = math.max(maxFiles, BatchIndex.committedFileCount(spark, path))
      if (b % 50 == 49) {
        // replay an old batch whose files were long since compacted away:
        // its marker must have survived every intervening compaction, so
        // the replay is a no-op and its (different!) rows never land
        BatchIndex.appendBatch(Seq((999L, 999L)).toDF("id", "v"), path,
          (b / 2).toLong, "soak v1")
        assert(BatchIndex.readCommitted(spark, path)
          .filter(col("id") === 999L).isEmpty,
          s"replay of batch ${b / 2} after compaction must be a no-op")
      }
    }
    // bound: appends grow the count to compactAbove + 1 at most, then the
    // cadence compacts back down — a leak here is the listing/footer tax
    // the 100 TB loop cannot pay
    assert(maxFiles <= compactAbove + 1,
      s"committed file count leaked past the cadence bound: $maxFiles")
    // served view identical to a single-shot build of the same rows
    val served = BatchIndex.readCommitted(spark, path)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(served == (0 until 200).map(b => (b.toLong, b * 10L)),
      "soaked index must serve exactly the single-shot row set")
  }
}
