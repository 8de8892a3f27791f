package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic exactly-once batch-append parquet index — the file protocol the
  * incremental MinHash index proved out ([[Dedup.appendToSignatureIndex]]),
  * extracted so other incremental artifacts (the IVF posting index, any
  * future per-ingest state) get the same crash-safety without re-deriving
  * it:
  *
  *   - a batch's rows are STAGED to a hidden temp dir, moved into the
  *     index under a `b<batchId>_` filename prefix, and committed by
  *     writing the `_graft_batch_<batchId>` marker LAST;
  *   - a replay of a committed batch returns without writing;
  *   - a retry of a CRASHED attempt first deletes the uncommitted
  *     prefixed files, so rows land exactly once no matter where the
  *     previous attempt died;
  *   - serve paths read only committed files — a crashed ingest's
  *     partials are invisible.
  *
  * A `meta` fingerprint written on first append guards against mixing
  * incompatibly-parameterized batches in one index (same discipline as
  * the signature index's parameter guard). Single-writer per index, like
  * every ingest loop here; 100 TB shape: per-ingest cost ∝ batch, the
  * index is never read or rewritten on append.
  */
object BatchIndex {

  private def hPath(s: String) = new Path(s)
  private def hFs(spark: SparkSession, path: String) =
    hPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(batchId: Long) = s"_graft_batch_$batchId"
  private def prefix(batchId: Long) = s"b${batchId}_"
  private val BatchFileRe = "^b([0-9]+)_.*".r
  private val metaName = "_graft_index_meta"

  /** True iff `batchId` has already been committed to the index. */
  def isCommitted(spark: SparkSession, path: String, batchId: Long): Boolean = {
    val fs = hFs(spark, path)
    fs.exists(hPath(path)) && fs.exists(new Path(path, marker(batchId)))
  }

  /** Heal the [[compact]] crash window (same two-rename swap as the
    * signature index): if the published path is missing but
    * `.compact_old` exists, the old directory is restored — the
    * compaction simply never happened. Every entry point calls this
    * first; without it the next append would silently bootstrap a fresh
    * index and abandon all committed batches. */
  private def recoverCompaction(fs: FileSystem, path: String): Unit = {
    val old = hPath(path + ".compact_old")
    if (!fs.exists(hPath(path)) && fs.exists(old)) {
      // a failed rename is not necessarily a failed recovery: a racing
      // entry point may have restored the path first
      if (!fs.rename(old, hPath(path)) && !fs.exists(hPath(path)))
        throw new java.io.IOException(
          s"failed to restore interrupted compaction of $path from $old")
      fs.delete(hPath(path + ".compact_tmp"), true): Unit
    }
  }

  /** Rewrite the index to `targetFiles` files, preserving the meta
    * fingerprint and every batch-commit marker (a late replay of an
    * already-compacted batch is still skipped). Only COMMITTED rows are
    * carried — a crashed ingest's uncommitted `b<id>_*` files drop with
    * the old directory; that batch has no marker, so its retry re-stages
    * from scratch and loses nothing. Single-writer, like append. Without
    * periodic compaction a long-lived ingest loop accretes one file set
    * per batch and every serve pays the listing/footer tax. */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 8): Unit =
    compactWith(spark, path, targetFiles)(identity)

  /** [[compact]] with a REWRITE hook: `transform` maps the committed view
    * to the rows the compacted index should hold — the GC seam for
    * indexes whose rows can become dead-by-construction (e.g. the winnow
    * index's over-df hashes, [[Dedup.compactWinnowIndex]]). The transform
    * must be SERVE-EQUIVALENT for every consumer of the index (same
    * answers from the compacted view), which is the caller's contract to
    * prove — the protocol here only guarantees the swap is atomic and
    * crash-healed like any compaction. */
  def compactWith(spark: SparkSession, path: String, targetFiles: Int = 8)(
      transform: DataFrame => DataFrame): Unit = {
    val fs = hFs(spark, path)
    recoverCompaction(fs, path)
    val tmp = hPath(path + ".compact_tmp")
    val old = hPath(path + ".compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    transform(readCommitted(spark, path))
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val keep = fs.listStatus(hPath(path)).map(_.getPath.getName)
      .filter(n => n == metaName || n.startsWith("_graft_batch_"))
    keep.foreach { n =>
      org.apache.hadoop.fs.FileUtil.copy(fs, new Path(path, n),
        fs, new Path(tmp.toString, n), false,
        spark.sparkContext.hadoopConfiguration)
    }
    if (!fs.rename(hPath(path), old)) throw new java.io.IOException(
      s"compaction failed to move $path aside")
    if (!fs.rename(tmp, hPath(path))) {
      fs.rename(old, hPath(path)) // restore — the new dir never became live
      throw new java.io.IOException(s"compaction failed to publish $tmp")
    }
    fs.delete(old, true): Unit
  }

  /** Exactly-once append of one batch (see object doc for the protocol).
    * No-op when the batch is already committed. */
  def appendBatch(df: DataFrame, path: String, batchId: Long,
      meta: String): Unit = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    val spark = df.sparkSession
    val fs = hFs(spark, path)
    recoverCompaction(fs, path)
    fs.mkdirs(hPath(path))
    val metaPath = new Path(path, metaName)
    if (fs.exists(metaPath)) {
      val in = fs.open(metaPath)
      val stored =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          StandardCharsets.UTF_8)
        finally in.close()
      require(stored == meta,
        s"batch index at $path was built with [$stored] but is being " +
          s"appended with [$meta]; rebuild the index or match the parameters")
    }
    if (fs.exists(new Path(path, marker(batchId)))) return // replayed commit
    val staging = new Path(path, s".staging_$batchId")
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    // deterministic retry cleanup: drop uncommitted files a crashed
    // previous attempt moved in, so the re-move below can't double them
    fs.listStatus(hPath(path)).map(_.getPath)
      .filter(_.getName.startsWith(prefix(batchId)))
      .foreach(p => fs.delete(p, false))
    fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { p =>
        if (!fs.rename(p, new Path(path, prefix(batchId) + p.getName)))
          throw new java.io.IOException(s"failed to move $p into index $path")
      }
    fs.delete(staging, true)
    if (!fs.exists(metaPath)) {
      val out = fs.create(metaPath, true)
      try out.write(meta.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    fs.create(new Path(path, marker(batchId)), true).close()
  }

  private def committedFiles(fs: FileSystem, path: String): Seq[String] = {
    if (!fs.exists(hPath(path))) return Seq.empty
    val statuses = fs.listStatus(hPath(path))
    val names = statuses.map(_.getPath.getName).toSet
    statuses.iterator.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .filter(p => p.getName match {
        case BatchFileRe(id) => names.contains(marker(id.toLong))
        case _ => true
      })
      .map(_.toString).toSeq
  }

  /** Number of committed data files — callers gate [[compact]] on this
    * (a long-lived ingest loop accretes one file set per batch). */
  def committedFileCount(spark: SparkSession, path: String): Int =
    committedFiles(hFs(spark, path), path).size

  /** The committed view of the index — the only read serve paths may use
    * (`spark.read.parquet(dir)` would surface crashed partials). Memoized
    * on the exact committed file list, so an append changes the cache key
    * and can never serve stale. */
  def readCommitted(spark: SparkSession, path: String): DataFrame = {
    val fs = hFs(spark, path)
    recoverCompaction(fs, path)
    val files = committedFiles(fs, path)
    require(files.nonEmpty,
      s"batch index at $path has no committed data files — append a batch " +
        "before serving")
    graft.core.Tables.readCachedParquet(spark, files)
  }
}
