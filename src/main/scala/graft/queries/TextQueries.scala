package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis / dedup queries over `documents` (north-star extension:
  * the operations a training-data pipeline needs). All are expressible with
  * codegen'd built-ins (split / explode / higher-order array functions) —
  * no UDFs — so they stay inside whole-stage codegen and scale by
  * partitioning on doc_id.
  */
object TextQueries {

  /** Exact deduplication: hash-groupBy on content; representative = min id.
    * Emits md5(text) so output stays narrow at scale. */
  def q16DedupExact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"))
      .select(col("rep_id"), col("n_copies"), col("text_md5"))
      .orderBy(col("rep_id"))
  }

  val q16DedupExactSql: String =
    """SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies, md5(text) AS text_md5
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY rep_id""".stripMargin

  /** Token-set Jaccard similarity between consecutive doc pairs: the exact
    * kernel of n-gram near-dup detection, blocked to (i, i+1) pairs so the
    * oracle stays O(n). The full candidate-generation path is the MinHash
    * query (q20) and [[graft.ops.Dedup]]. */
  def q17TokenJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = d.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_toks"))
    val inter = toks.as("a")
      .join(toks.as("b"), col("b.doc_id") === col("a.doc_id") + 1 && col("a.tok") === col("b.tok"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_inter"))
    sizes.as("sa")
      .join(sizes.as("sb"), col("sb.doc_id") === col("sa.doc_id") + 1)
      .join(inter, col("sa.doc_id") === inter("doc_id"), "left")
      .select(
        col("sa.doc_id").as("doc_a"),
        (col("sa.doc_id") + 1).as("doc_b"),
        col("sa.n_toks").as("n_a"),
        col("sb.n_toks").as("n_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("sa.n_toks") + col("sb.n_toks") - coalesce(col("n_inter"), lit(0L))))
          .as("jaccard"))
      .orderBy(col("doc_a"))
  }

  val q17TokenJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_id, COUNT(*) AS n_inter
      |  FROM toks a JOIN toks b
      |    ON b.doc_id = a.doc_id + 1 AND a.tok = b.tok
      |  GROUP BY a.doc_id)
      |SELECT sa.doc_id AS doc_a, sa.doc_id + 1 AS doc_b,
      |  sa.n_toks AS n_a, sb.n_toks AS n_b,
      |  COALESCE(i.n_inter, 0) AS n_inter,
      |  CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
      |    / (sa.n_toks + sb.n_toks - COALESCE(i.n_inter, 0)) AS jaccard
      |FROM sizes sa
      |JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
      |LEFT JOIN inter i ON i.doc_id = sa.doc_id
      |ORDER BY doc_a""".stripMargin

  /** Per-document token counting + quality scoring (length / stopword
    * ratios) via higher-order array functions — fully codegen'd. */
  def q18TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = split(col("text"), " ")
    d.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        size(filter(toks, t => t.isin("the", "a"))).cast("long").as("n_stop"),
        (size(filter(toks, t => t.isin("the", "a"))).cast("double") /
          size(toks)).as("stop_ratio"),
        (col("n_chars").cast("double") / size(toks)).as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  val q18TokenStatsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stop_ratio,
      |  CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Corpus profile: language × source distribution with size stats. */
  def q19LangProfile(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .orderBy(col("lang"), col("source"))
  }

  val q19LangProfileSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin
}
