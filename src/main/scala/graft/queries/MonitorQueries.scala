package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Monitor

/** Corpus-monitoring gates: the drift / diversity metrics a pipeline runs
  * on every ingest to catch a source gone wrong BEFORE it trains a model.
  */
object MonitorQueries {

  /** q97: per-source Population Stability Index of the document-length
    * distribution vs the corpus — "did any source's length profile drift
    * from the corpus shape?". Fixed 100-char buckets, Laplace smoothing,
    * per-bucket terms fp9-rounded before the (integer) sum so the result
    * is reduction-order-free. One corpus shuffle; the rest is grid-sized.
    */
  def q97PsiDrift(spark: SparkSession, dir: String): DataFrame =
    Monitor.psiByGroup(
        Tables.documents(spark, dir), "source", expr("n_chars div 100"))
      .select(col("source"), col("n_docs"), col("psi_fp9"))

  val q97PsiDriftSql: String =
    """WITH grp AS (
      |  SELECT source, n_chars // 100 AS bucket, COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_g FROM grp GROUP BY 1),
      |bkt AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_b FROM grp GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n, COUNT(*) AS nb FROM bkt),
      |terms AS (
      |  SELECT s.source, s.n_g,
      |    CAST(round(
      |      ((COALESCE(g.c, 0) + 0.5) / (s.n_g + 0.5 * t.nb)
      |        - (b.n_b + 0.5) / (t.n + 0.5 * t.nb))
      |      * ln(((COALESCE(g.c, 0) + 0.5) / (s.n_g + 0.5 * t.nb))
      |           / ((b.n_b + 0.5) / (t.n + 0.5 * t.nb)))
      |      * 1e9) AS BIGINT) AS term_fp9
      |  FROM src s
      |  CROSS JOIN bkt b
      |  CROSS JOIN tot t
      |  LEFT JOIN grp g ON g.source = s.source AND g.bucket = b.bucket)
      |SELECT source, n_g AS n_docs, CAST(SUM(term_fp9) AS BIGINT) AS psi_fp9
      |FROM terms GROUP BY source, n_g""".stripMargin
}
