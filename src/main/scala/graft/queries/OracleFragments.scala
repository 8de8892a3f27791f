package graft.queries

import graft.ops.TextOps

/** Shared DuckDB-oracle SQL fragments. Each fragment mirrors ONE Spark-side
  * kernel and is used by several gates — factoring them means a change to
  * the hash construction or the quality heuristic is edited in exactly one
  * place per engine, instead of hand-replicated across oracle strings (the
  * drift risk: a missed copy silently desynchronizes one gate).
  * [[Embeddings.sigCtes]] plays the same role for the LSH signatures.
  */
private[queries] object OracleFragments {

  /** The gate MinHash construction as CTEs (mirrors
    * [[graft.ops.Dedup.minhashSignatures]]): 3-word shingles from
    * `from`, 2 md5 digests per shingle, 8 seed minima over 8-hex-char
    * slices. Emits CTEs `<p>toks`, `<p>shingles`, `<p>shd`, `<p>sig`
    * (sig: doc_id, seed, mh); `p` disambiguates when composed with other
    * CTEs in one WITH block. */
  def minhashSigCtes(from: String, p: String = ""): String =
    s"""${p}toks AS (
       |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
       |         unnest(string_split(text,' ')) AS tok
       |  FROM $from),
       |${p}shingles AS (
       |  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS sh
       |  FROM ${p}toks a
       |  JOIN ${p}toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  JOIN ${p}toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
       |${p}shd AS (
       |  SELECT doc_id, md5(sh) AS d0, md5(sh||'#') AS d1 FROM ${p}shingles),
       |${p}sig AS (
       |  SELECT doc_id, seed,
       |    MIN(substr(CASE WHEN seed < 4 THEN d0 ELSE d1 END,
       |               (seed % 4) * 8 + 1, 8)) AS mh
       |  FROM ${p}shd CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6,7]) AS seed) s
       |  GROUP BY doc_id, seed)""".stripMargin

  /** Per-language stopword-count expression (mirrors the counting inside
    * [[TextOps.langId]]). */
  def langScore(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'), x -> x IN ($list)))"
  }

  /** `s0..sN` scored-language columns for a WITH-block SELECT. */
  def langScoreCols: String =
    TextOps.langProfiles.zipWithIndex
      .map { case ((_, ws), i) => s"${langScore(ws)} AS s$i" }
      .mkString(",\n    ")

  /** Language-ID argmax CASE over `s0..sN` with declaration-order
    * tie-break (mirrors [[TextOps.langId]]). */
  def langPredCase: String = {
    val langs = TextOps.langProfiles
    val preds = langs.zipWithIndex.init.map { case ((lang, _), i) =>
      val geAll = (i + 1 until langs.size).map(j => s"s$i >= s$j").mkString(" AND ")
      s"WHEN $geAll THEN '$lang'"
    }.mkString(" ")
    s"CASE $preds ELSE '${langs.last._1}' END"
  }

  /** The 4-component quality score over columns `toks` (token list) and
    * `text` (mirrors [[TextOps.qualityScore]] with the English stopword
    * profile). */
  def qualityExpr: String = {
    val en = TextOps.langProfiles.head._2.map(w => s"'$w'").mkString(", ")
    s"""((CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) +
       |     (CASE WHEN CAST(len(list_filter(toks, x -> x IN ($en))) AS DOUBLE) / len(toks)
       |           BETWEEN 0.01 AND 0.8 THEN 1.0 ELSE 0.0 END) +
       |     (CASE WHEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.05
       |           THEN 1.0 ELSE 0.0 END) +
       |     (CASE WHEN CAST(length(text) AS DOUBLE) / len(toks) BETWEEN 2.0 AND 12.0
       |           THEN 1.0 ELSE 0.0 END)) / 4.0""".stripMargin

  }

  /** First 8 hex chars of md5(`e`) as BIGINT (mirrors
    * [[graft.ops.TrainingMix.hex8]]). */
  def hex8Sql(e: String): String =
    "(" + (1 to 8).map { i =>
      s"CAST(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (8 - i))}"
    }.mkString(" + ") + ")"

  /** First 13 hex chars of md5(`e`) as BIGINT in [0, 2⁵²) (mirrors
    * [[graft.ops.TrainingMix.hex13]]). */
  def hex13Sql(e: String): String =
    "(" + (1 to 13).map { i =>
      s"CAST(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (13 - i))}"
    }.mkString(" + ") + ")"
}
