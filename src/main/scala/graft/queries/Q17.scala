package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}

/** Correlated-aggregate queries (TPC-H Q17 flavor): rows filtered against a
  * per-group aggregate of the same table — the pattern Catalyst rewrites a
  * correlated scalar subquery into (aggregate + join). Expressed directly
  * in that join form so the per-part average is computed once, partial-
  * aggregated map-side, and broadcast when small.
  */
object Q17 {

  def q33SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    // exact: quantities are integer-valued doubles -> SUM/COUNT is
    // order-independent; the 0.5* comparison is one IEEE multiply
    val perPart = l.groupBy(col("l_partkey"))
      .agg((sum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
    l.join(perPart, "l_partkey")
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(
        (Det.centsSum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  val q33SmallQtyRevenueSql: String =
    """WITH pa AS (
      |  SELECT l_partkey, CAST(SUM(l_quantity) AS DOUBLE)/COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)/100.0/7.0 AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM lineitem JOIN pa USING (l_partkey)
      |WHERE l_quantity < 0.5 * avg_qty""".stripMargin

  /** BPE-ish token counting (north-star "token counting: whitespace + a
    * BPE-ish regex"): whitespace tokens vs subword-ish segments (letter
    * runs, single digits, single punctuation). */
  def q34TokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]|[^a-z0-9 ]")).cast("long")
          .as("bpeish_tokens"))
  }

  val q34TokenCountsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS bpeish_tokens
      |FROM documents""".stripMargin
}
