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

  /** q174: robust (median/MAD) outlier report per event type — the
    * monitoring alternative to mean/stddev z-scores, which a single bad
    * batch can drag far enough to mask itself. Values go to exact
    * micro-units; both medians use the q112 cumulative-crossing rule
    * (lower median — integer comparisons, no interpolation); the outlier
    * cut |v − med| > 3.5 · 1.4826 · MAD is the integer cross-
    * multiplication `dev · 100000 > 518910 · mad`, so no float enters the
    * gate at all. Two window passes over the SAME (event_type) hash
    * partitioning — the exchange is planned once and reused; everything
    * after the per-row dev column is type-sized. */
  def q174MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir).select(col("event_type"),
      col("event_id"), round(col("value") * 1e6).cast("long").as("v_us"))
    def crossingMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val wOrd = Window.partitionBy(col("event_type"))
        .orderBy(col(v), col("event_id"))
      val wAll = Window.partitionBy(col("event_type"))
      df.withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rn") * 2 >= col("n"))
        .groupBy(col("event_type")).agg(min(col(v)).as(out))
    }
    val med = crossingMedian(e, "v_us", "med_us")
    val dev = e.join(broadcast(med), "event_type")
      .select(col("event_type"), col("event_id"),
        abs(col("v_us") - col("med_us")).as("dev"))
    val mad = crossingMedian(dev, "dev", "mad_us")
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("dev") * 100000L > col("mad_us") * 518910L).cast("long"))
          .as("n_outliers"))
      .join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .select(col("event_type"), col("n"), col("med_us"), col("mad_us"),
        col("n_outliers"))
  }

  val q174MadOutliersSql: String =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 1e6) AS BIGINT) AS v_us
      |  FROM events),
      |r1 AS (
      |  SELECT event_type, v_us,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v_us, event_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |med AS (
      |  SELECT event_type, MIN(v_us) AS med_us FROM r1
      |  WHERE rn * 2 >= n GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, e.event_id, abs(e.v_us - m.med_us) AS dev
      |  FROM e JOIN med m USING (event_type)),
      |r2 AS (
      |  SELECT event_type, dev,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT event_type, MIN(dev) AS mad_us FROM r2
      |  WHERE rn * 2 >= n GROUP BY 1)
      |SELECT d.event_type, COUNT(*) AS n, MIN(m.med_us) AS med_us,
      |  MIN(a.mad_us) AS mad_us,
      |  CAST(SUM(CASE WHEN d.dev * 100000 > a.mad_us * 518910
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN med m USING (event_type) JOIN mad a USING (event_type)
      |GROUP BY d.event_type""".stripMargin
}
