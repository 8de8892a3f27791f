package graft.core

import org.apache.spark.sql.SparkSession

/** Artifact-path fingerprinting shared by every derived-artifact cache
  * (IVF centroids, MinHash signature indexes): the tag folds the source
  * parquet's length and mtime, so a regenerated dataset can never serve a
  * stale artifact — the artifact path itself changes. One implementation,
  * because the two previous private copies had to stay in lockstep for
  * the staleness guarantee to hold everywhere.
  */
object Artifacts {

  /** `<tmpdir>/graft_artifacts/<prefix>_<len-xor-rotated-mtime>` for the
    * file or directory at `srcPath`. */
  def path(spark: SparkSession, srcPath: String, prefix: String): String = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val st = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(src)
    val tag = java.lang.Long.toHexString(st.getLen ^
      java.lang.Long.rotateLeft(st.getModificationTime, 21))
    s"${sys.props("java.io.tmpdir")}/graft_artifacts/${prefix}_$tag"
  }
}
