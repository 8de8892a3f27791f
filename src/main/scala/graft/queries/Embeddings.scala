package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity

/** Similarity-search gate queries over `embeddings` (vec_id, embedding:
  * array<float>[64], label). The cosine kernel folds arrays sequentially in
  * double on both engines, so raw similarity values are bit-identical and
  * hash-comparable without rounding.
  */
object Embeddings {

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Exact brute-force cosine top-10 for three probe vectors. */
  def q20EmbedTopK(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val q = v.filter(col("id") < 3).select(col("id").as("qid"), col("vec").as("qvec"))
    Similarity.bruteForceTopK(v, q, 10)
      .withColumnRenamed("id", "neighbor_id")
      .orderBy(col("qid"), col("rank"))
  }

  val q20EmbedTopKSql: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id < 3),
      |s AS (
      |  SELECT qid, vec_id,
      |    list_cosine_similarity(embedding::DOUBLE[], qv) AS sim
      |  FROM embeddings, q WHERE vec_id <> qid),
      |r AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
      |  FROM s)
      |SELECT qid, CAST(rn AS BIGINT) AS rank, vec_id AS neighbor_id, sim
      |FROM r WHERE rn <= 10
      |ORDER BY qid, rank""".stripMargin

  /** Embedding near-duplicate pairs: all (i < j) with cosine > 0.35. */
  def q21EmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    Similarity.nearDupPairs(v, 0.35)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q21EmbedNearDupSql: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
      |ORDER BY id_a, id_b""".stripMargin

  /** Per-label centroids (the IVF building block): posexplode to (label,
    * dim, value), average per cell. Values are rounded to 6 decimals first
    * so the decimal-sum is exact cross-engine (floats are not 2-decimal). */
  def q22LabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    e.select(col("label").cast("long").as("label"), posexplode(col("embedding")).as(Seq("dim", "val")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("val").cast("double"), 6).cast("decimal(18,6)").as("v"))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("v")).cast("double") / count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim"))
  }

  val q22LabelCentroidsSql: String =
    """WITH expl AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
      |  FROM embeddings)
      |SELECT label, dim,
      |  CAST(SUM(v) AS DOUBLE) / COUNT(*) AS centroid, COUNT(*) AS n
      |FROM expl
      |GROUP BY label, dim
      |ORDER BY label, dim""".stripMargin

  /** Embedding-corpus curation: remove vectors with cosine > 0.35 to any
    * lower-id vector (keep-first dedup over q21's pair semantics). */
  def q48EmbedCuration(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Curation.curateEmbeddings(vectors(spark, dir), 0.35)
      .select(col("id").as("vec_id"))
      .orderBy(col("vec_id"))

  val q48EmbedCurationSql: String =
    """SELECT vec_id FROM embeddings e
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM embeddings d
      |  WHERE d.vec_id < e.vec_id
      |    AND list_cosine_similarity(d.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0.35)
      |ORDER BY vec_id""".stripMargin

  /** IVF ANN: Lloyd-trained centroids, nprobe-pruned exact rerank (rows-
    * only gate; recall asserted on clustered fixtures in the test suite). */
  def q35AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val q = v.filter(col("id") < 3).select(col("id").as("qid"), col("vec").as("qvec"))
    val cents = Similarity.trainCentroids(v, k = 16, iters = 2, init = "sample")
    Similarity.ivfTopK(v, q, 10, cents, nprobe = 4)
      .withColumnRenamed("id", "neighbor_id")
      .orderBy(col("qid"), col("rank"))
  }

  /** Approximate top-k via random-hyperplane LSH (the scale path). Not
    * SQL-expressible — gated by the rows-only check; recall vs the exact
    * baseline is asserted in the test suite. */
  def q23AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val q = v.filter(col("id") < 3).select(col("id").as("qid"), col("vec").as("qvec"))
    Similarity.lshTopK(v, q, 10)
      .withColumnRenamed("id", "neighbor_id")
      .orderBy(col("qid"), col("rank"))
  }
}
