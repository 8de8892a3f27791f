package graft.core

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession

/** Artifact-path fingerprinting shared by every derived-artifact cache
  * (IVF centroids, MinHash signature indexes, winnow fingerprints, BM25
  * postings): the tag folds the source parquet's length and mtime, so a
  * regenerated dataset can never serve a stale artifact — the artifact
  * path itself changes. One implementation, because the two previous
  * private copies had to stay in lockstep for the staleness guarantee to
  * hold everywhere.
  *
  * GC (r18): the keying that makes staleness impossible also STRANDS the
  * old directory — nothing ever computes its key again once the source is
  * regenerated. [[path]] therefore drops a write-once provenance sidecar
  * (`<dir>.src`, holding the source path) beside each keyed dir, and
  * [[sweep]] reclaims every dir whose recorded source is gone or no
  * longer fingerprints to the dir's own key. Serving correctness never
  * depends on the sweep — it is pure disk hygiene for long-lived hosts
  * (the 100 TB ingest loop regenerates corpora for months against one
  * artifact root); run it from [[graft.tools.ArtifactGc]] or any
  * maintenance window. Single-writer discipline applies as everywhere
  * else: don't sweep while another session is mid-build on the same root.
  */
object Artifacts {

  private val SrcSuffix = ".src"

  private def root: String =
    s"${sys.props("java.io.tmpdir")}/graft_artifacts"

  /** The current fingerprint tag of `srcPath`, or None when the source no
    * longer exists (its artifacts can then never be keyed again). */
  private def currentTag(spark: SparkSession, srcPath: String): Option[String] = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(src)) None
    else {
      val st = fs.getFileStatus(src)
      Some(java.lang.Long.toHexString(st.getLen ^
        java.lang.Long.rotateLeft(st.getModificationTime, 21)))
    }
  }

  /** `<tmpdir>/graft_artifacts/<prefix>_<len-xor-rotated-mtime>` for the
    * file or directory at `srcPath`. Also records the provenance sidecar
    * (best-effort) so [[sweep]] can later tell whether the key is still
    * live. The sidecar ACCUMULATES every observed source (one per line):
    * two distinct sources with identical (length, mtime) and the same
    * prefix legitimately share one keyed dir, and the dir must stay live
    * while ANY of them still fingerprints to the key — a write-once
    * sidecar naming only the first source would let sweep reclaim a dir
    * still serving the second. */
  def path(spark: SparkSession, srcPath: String, prefix: String): String = {
    val tag = currentTag(spark, srcPath).getOrElse(
      throw new java.io.FileNotFoundException(
        s"artifact source does not exist: $srcPath"))
    val dir = s"$root/${prefix}_$tag"
    try {
      val meta = new java.io.File(dir + SrcSuffix)
      val existing =
        if (meta.exists())
          new String(java.nio.file.Files.readAllBytes(meta.toPath),
            StandardCharsets.UTF_8).linesIterator.filter(_.nonEmpty).toVector
        else Vector.empty
      if (!existing.contains(srcPath)) {
        new java.io.File(root).mkdirs()
        // temp-then-rename publish: a concurrent session reading the
        // sidecar never sees a half-written source list
        val tmp = java.io.File.createTempFile(".src", ".tmp",
          new java.io.File(root))
        java.nio.file.Files.write(tmp.toPath,
          (existing :+ srcPath).mkString("\n").getBytes(StandardCharsets.UTF_8))
        if (!tmp.renameTo(meta)) tmp.delete(): Unit
      }
    } catch { case _: java.io.IOException => () } // hygiene, never blocks
    dir
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Reclaim stranded artifact dirs. A keyed dir is DEAD — unreachable by
    * any future [[path]] call — exactly when its recorded source is gone
    * or the source's CURRENT fingerprint no longer matches the key in the
    * dir's name (the corpus was regenerated; the new key is a different
    * dir). Dead dirs and their sidecars are deleted; orphaned sidecars
    * (dir already removed by hand) are cleaned too. Dirs without a
    * sidecar (pre-r18 layouts, foreign tenants of the tmpdir) are left
    * alone unless `deleteUnknown` — the sweep must never eat what it
    * cannot prove it owns. Returns the deleted dir paths. */
  def sweep(spark: SparkSession, deleteUnknown: Boolean = false): Seq[String] = {
    val entries = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
    val deleted = scala.collection.mutable.Buffer.empty[String]
    entries.filter(_.isDirectory).foreach { d =>
      val meta = new java.io.File(d.getPath + SrcSuffix)
      // the sidecar read is best-effort: one deleted or unreadable sidecar
      // mid-sweep (single-writer discipline violated, or a racing cleanup)
      // must skip THAT entry, not abort the whole sweep — mirror the
      // write-side discipline in [[path]]. An unreadable sidecar is
      // indistinguishable from "no provenance", so the dir is treated as
      // unknown (kept unless deleteUnknown).
      val srcs: Option[Vector[String]] =
        if (!meta.exists()) None
        else
          try Some(new String(java.nio.file.Files.readAllBytes(meta.toPath),
            StandardCharsets.UTF_8).linesIterator.filter(_.nonEmpty).toVector)
          catch { case _: java.io.IOException => None }
      val dead = srcs match {
        // dead only when EVERY recorded source is gone or re-fingerprints
        // to a different key — any one live source keeps the dir. An
        // empty (truncated) sidecar proves nothing: treat as unknown.
        case Some(list) if list.nonEmpty => list.forall(src =>
          currentTag(spark, src).forall(tag => !d.getName.endsWith("_" + tag)))
        case _ => deleteUnknown
      }
      if (dead) {
        deleteRecursively(d)
        meta.delete()
        deleted += d.getPath
      }
    }
    // sidecars whose dir vanished out-of-band carry no information
    entries.filter(f => f.isFile && f.getName.endsWith(SrcSuffix))
      .filter(f => !new java.io.File(
        f.getPath.stripSuffix(SrcSuffix)).exists())
      .foreach(_.delete())
    deleted.toSeq
  }
}
