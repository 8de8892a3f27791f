package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, TextOps}

/** The full training-data curation pipeline as ONE oracle-gated query:
  * quality gate → language ID → exact dedup → MinHash candidate + verified-
  * Jaccard near-dup removal → portable fingerprint. The oracle rebuilds
  * every stage in DuckDB SQL from the same primitives already gated
  * individually (q16/q24/q26/q27), so the hash compare certifies the
  * composition, not just the parts.
  */
object CurationQuery {

  def q47Curation(spark: SparkSession, dir: String): DataFrame = {
    val curated = Curation.curate(
      // spread: scoring + language-ID + the dedup hash all run before the
      // first shuffle; a single-row-group corpus would compute them serially
      Tables.spread(Tables.documents(spark, dir)), "doc_id", "text",
      Curation.Config(minQuality = 0.6, nearDupJaccard = 0.8,
        fingerprint = TextOps.fingerprintMd5)) // md5 = the oracle-portable variant
    curated
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("fingerprint"))
  }

  val q47CurationSql: String = {
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |    ${OracleFragments.langScoreCols},
       |    string_split(text, ' ') AS toks
       |  FROM documents),
       |quality AS (
       |  SELECT doc_id, text,
       |    ${OracleFragments.langPredCase} AS pred_lang,
       |    ${OracleFragments.qualityExpr} AS quality
       |  FROM scored),
       |passing AS (SELECT * FROM quality WHERE quality >= 0.6),
       |exact AS (
       |  SELECT p.* FROM passing p
       |  JOIN (SELECT MIN(doc_id) AS doc_id FROM passing GROUP BY md5(text)) k
       |    USING (doc_id)),
       |${OracleFragments.minhashSigCtes("exact")},
       |cand AS (
       |  SELECT DISTINCT s1.doc_id AS id_a, s2.doc_id AS id_b
       |  FROM sig s1
       |  JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id),
       |dsh AS (SELECT DISTINCT doc_id, sh FROM shingles),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, COUNT(*) AS ni
       |  FROM cand c
       |  JOIN dsh x ON x.doc_id = c.id_a
       |  JOIN dsh y ON y.doc_id = c.id_b AND y.sh = x.sh
       |  GROUP BY c.id_a, c.id_b),
       |losers AS (
       |  SELECT DISTINCT i.id_b AS doc_id
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.id_a
       |  JOIN sizes sb ON sb.doc_id = i.id_b
       |  WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.8),
       |final AS (
       |  SELECT e.* FROM exact e LEFT JOIN losers l USING (doc_id)
       |  WHERE l.doc_id IS NULL),
       |hashed AS (
       |  SELECT doc_id, pred_lang, quality,
       |    list_transform(string_split(text, ' '),
       |      t -> list_reduce(list_concat([CAST(0 AS BIGINT)],
       |             list_transform(generate_series(1, 8),
       |               i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT))),
       |           (a, b) -> a * 16 + b) % 2147483647) AS hs
       |  FROM final)
       |SELECT doc_id, pred_lang, quality,
       |  list_reduce(list_concat([CAST(0 AS BIGINT)], hs),
       |    (a, b) -> (a * 1000003 + b) % 2147483647) AS fingerprint
       |FROM hashed""".stripMargin
  }
}
