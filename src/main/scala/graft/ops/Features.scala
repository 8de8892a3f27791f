package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-hashing ("hashing trick") featurization — the fixed-width
  * text→vector step (Weinberger et al. 2009, "Feature Hashing for Large
  * Scale Multitask Learning"; the HashingTF/TfidfVectorizer surface):
  * terms hash into a fixed `dim`-bucket space, colliding terms SUM, so
  * the feature space is bounded a-priori — no vocabulary build, no
  * dictionary broadcast, no out-of-vocabulary class. That absence of a
  * fitted vocabulary is the 100 TB property: featurization is a pure
  * per-row projection any executor can run independently, and two
  * corpora (or two ingest batches) featurize into the SAME space without
  * coordinating.
  *
  * [[hashedTfIdf]] adds the smoothed-IDF weighting (the sklearn
  * `TfidfVectorizer(smooth_idf=True)` convention: `ln((N+1)/(df+1)) + 1`
  * — never zero, never divides by zero): bucket document-frequencies are
  * one aggregation REUSING the (doc, bucket) partitioning of the TF pass
  * (map-side partial, no second wide shuffle); the corpus size is a
  * one-row broadcast cross join (the q72/q54 pattern). IDF values round
  * to 1e-6 fixed-point longs BEFORE the tf multiply, so weighted scores
  * are exact integers — order-free, hash-comparable, libm-ulp-immune.
  */
object Features {

  /** Hashed term-frequency vectors in COO form: one row per (doc,
    * bucket) with `tf` = total occurrences of all terms hashing to the
    * bucket. The bucket is md5-derived (`hex8(term) % dim` — the same
    * engine-portable uniform every sampling/MinHash gate replays), NOT
    * JVM `String.hashCode`, so vectors are identical across engines and
    * languages.
    *
    * @param dim number of hash buckets (the fixed feature width)
    */
  def hashedTf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, "dim must be positive")
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(col("doc_id"),
        (TrainingMix.hex8(concat(col("term"), lit("#fh"))) % dim).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Smoothed TF-IDF over the hashed space: (doc_id, bucket, tf,
    * idf_fp6, tfidf_fp6) with `idf_fp6 = round(1e6·(ln((N+1)/(df+1))+1))`
    * and `tfidf_fp6 = tf · idf_fp6` — exact integers after the one
    * rounding, so the gate hash-compares with zero float tolerance.
    *
    * df (docs-per-bucket) is a window count OVER the tf rows, not a
    * second aggregation branch: tf is already one row per (doc, bucket),
    * so `count(*) over (partition by bucket)` is df exactly — and the
    * window keeps the lineage LINEAR. A groupBy-then-join-back form
    * re-executes the whole token explode from the scan for the second
    * branch (no barrier ⇒ Spark recomputes shared lineage), which is a
    * double read of the corpus text at 100 TB; the window form scans
    * once and only re-shuffles the narrow aggregated rows (PlanSpec
    * pins single-explode). `n_docs` counts the full corpus (blank docs
    * included — the sklearn smooth_idf convention) via a metadata-only
    * parquet count, broadcast as a one-row cross join. */
  def hashedTfIdf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    val tf = hashedTf(docs, idCol, textCol, dim)
    val dfCol = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("bucket")))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs").cast("double") + lit(1.0)) /
      (col("df").cast("double") + lit(1.0))) + lit(1.0)
    tf.withColumn("df", dfCol)
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("bucket"), col("tf"),
        round(idf * lit(1e6)).cast("long").as("idf_fp6"))
      .withColumn("tfidf_fp6", col("tf") * col("idf_fp6"))
  }
}
