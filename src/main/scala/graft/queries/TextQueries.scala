package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  }

  val q16DedupExactSql: String =
    """SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies, md5(text) AS text_md5
      |FROM documents
      |GROUP BY md5(text)""".stripMargin

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
      |LEFT JOIN inter i ON i.doc_id = sa.doc_id""".stripMargin

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
  }

  val q18TokenStatsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stop_ratio,
      |  CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
      |FROM documents""".stripMargin

  /** Corpus profile: language × source distribution with size stats. */
  def q19LangProfile(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
  }

  val q19LangProfileSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents
      |GROUP BY lang, source""".stripMargin

  /** Gopher-style repetition filter statistics, per document: fraction of
    * bigram occurrences taken by the most frequent bigram, fraction of
    * duplicate trigram occurrences, and the longest identical-token run —
    * one codegen'd projection ([[graft.ops.TextOps.repetitionStats]]). The
    * oracle rebuilds each statistic relationally (unnest + group / window),
    * certifying the one-pass kernel against an independent derivation. */
  def q59Repetition(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
        graft.ops.TextOps.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"),
        col("r.top_bigram_frac").as("top_bigram_frac"),
        col("r.dup_trigram_frac").as("dup_trigram_frac"),
        col("r.max_run").as("max_run"))
  }

  val q59RepetitionSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |           i -> toks[i] || ' ' || toks[i + 1])) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |topb AS (
      |  SELECT doc_id, MAX(c) AS maxc, SUM(c) AS nb FROM (
      |    SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg)
      |  GROUP BY doc_id),
      |tg AS (
      |  SELECT doc_id,
      |    len(toks) - 2 AS nt,
      |    len(list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS dt
      |  FROM t WHERE len(toks) >= 3),
      |runs AS (
      |  SELECT doc_id, MAX(rl) AS max_run FROM (
      |    SELECT doc_id, COUNT(*) AS rl FROM (
      |      SELECT doc_id, tok, pos,
      |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS g
      |      FROM (SELECT doc_id, unnest(toks) AS tok,
      |              generate_subscripts(toks, 1) AS pos FROM t))
      |    GROUP BY doc_id, tok, g)
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(topb.maxc AS DOUBLE) / topb.nb AS top_bigram_frac,
      |  CAST(tg.nt - tg.dt AS DOUBLE) / tg.nt AS dup_trigram_frac,
      |  CAST(runs.max_run AS BIGINT) AS max_run
      |FROM documents d
      |LEFT JOIN topb ON topb.doc_id = d.doc_id
      |LEFT JOIN tg ON tg.doc_id = d.doc_id
      |LEFT JOIN runs ON runs.doc_id = d.doc_id""".stripMargin

  /** Corpus-frequency token novelty ([[graft.ops.TextOps.tokenNovelty]]):
    * the two-pass document-frequency pipeline (build the vocabulary DF
    * table, join it back, aggregate per doc). */
  def q60TokenNovelty(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    graft.ops.TextOps.tokenNovelty(d, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
  }

  val q60TokenNoveltySql: String =
    """WITH dt AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents),
      |dfreq AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok)
      |SELECT doc_id,
      |  COUNT(*) AS n_distinct,
      |  CAST(SUM(df) AS DOUBLE) / COUNT(*) AS mean_df,
      |  CAST(MAX(df) AS BIGINT) AS max_df,
      |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |FROM dt JOIN dfreq USING (tok)
      |GROUP BY doc_id""".stripMargin

  /** PII redaction gate ([[graft.ops.TextOps.redactPii]]): the synthetic
    * corpus carries no PII, so each doc is augmented with a DETERMINISTIC
    * email + NANP phone derived from doc_id, then scrubbed; the gate
    * compares the full redacted text plus per-row audit counts. Both
    * engines run the identical patterns (Java regex here, RE2 in DuckDB —
    * the pragmatic character-class forms agree on every input by
    * construction; backtracking-dependent monsters would not). */
  def q66PiiRedaction(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val aug = d.select(col("doc_id"), concat(
      col("text"),
      lit(" u"), col("doc_id").cast("string"),
      lit("@ex"), pmod(col("doc_id"), lit(5)).cast("string"), lit(".org 555-"),
      lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("t"))
    aug.select(col("doc_id"),
        graft.ops.TextOps.redactPii(col("t")).as("redacted"),
        graft.ops.TextOps.emailCount(col("t")).cast("long").as("n_email"),
        graft.ops.TextOps.phoneCount(col("t")).cast("long").as("n_phone"))
  }

  /** BM25 retrieval gate ([[graft.ops.TextRank.bm25TopK]]): top-10 docs
    * per query for a fixed 4-query set over the corpus vocabulary (one
    * query includes the rare term `dup`, df≈5% — the idf spread is what
    * distinguishes BM25 from bare tf). The oracle replays the identical
    * IEEE expression tree (same literals, same association, DuckDB `ln`
    * vs Math.log) and the same 1e-6 fixed-point rounding before the
    * integer score sum — see the determinism note on [[graft.ops.TextRank]].
    * Scores are emitted as fixed-point LONGS so the gate hash-compares
    * with no float tolerance at all. */
  val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "window", "agg"),
    2L -> Seq("hash", "join", "dup"),
    3L -> Seq("stream", "batch", "data"),
    4L -> Seq("filter", "scan", "sort", "key"))

  def q76Bm25(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextRank.bm25TopK(
      Tables.documents(spark, dir), Bm25Queries, "doc_id", "text", k = 10)

  /** The q76 BM25 CTE chain up to ranked lists (ends with CTE `lex`
    * holding (query_id, doc_id, score_fp6, rank ≤ k)) — shared by the
    * q76 gate and the q95 RRF fusion. */
  private[graft] def bm25Ctes(k: Int): String = {
    val qvals = Bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""qt(query_id, term) AS (VALUES $qvals),
      |tok AS (
      |  SELECT doc_id, t AS term
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE t <> ''),
      |lens AS (SELECT doc_id, COUNT(*) AS len_d FROM tok GROUP BY doc_id),
      |stats AS (SELECT COUNT(*) AS n_docs, SUM(len_d) AS tot_len FROM lens),
      |dfs AS (
      |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
      |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
      |tf AS (
      |  SELECT q.query_id, t.doc_id, t.term, COUNT(*) AS tf
      |  FROM tok t JOIN qt q USING (term) GROUP BY 1, 2, 3),
      |contrib AS (
      |  SELECT tf.query_id, tf.doc_id,
      |    CAST(round(
      |      ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
      |      * ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (l.len_d / (CAST(s.tot_len AS DOUBLE) / s.n_docs)))))
      |      * 1e6) AS BIGINT) AS c
      |  FROM tf
      |  JOIN dfs d USING (term)
      |  JOIN lens l ON l.doc_id = tf.doc_id
      |  CROSS JOIN stats s),
      |bm25scores AS (
      |  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_fp6
      |  FROM contrib GROUP BY 1, 2),
      |lex AS (
      |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_fp6,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_fp6 DESC, doc_id) AS BIGINT) AS rank
      |  FROM bm25scores
      |  QUALIFY rank <= $k)""".stripMargin
  }

  val q76Bm25Sql: String =
    s"""WITH ${bm25Ctes(10)}
      |SELECT query_id, rank, doc_id, score_fp6 FROM lex""".stripMargin

  /** q254: BM25 served from a persisted POSTING INDEX — the q101
    * exactly-once artifact contract applied to the q76 scorer, so
    * retrieval is a serving-shape index lookup instead of a per-query
    * corpus job. The index (one [[graft.ops.BatchIndex]] of
    * (term, doc_id, tf, len_d) posting rows + per-batch corpus-stats
    * sentinels) is built in TWO committed batch appends split at the
    * median doc_id — replayed appends no-op, so re-runs serve straight
    * from parquet; the artifact path is keyed by the source's len+mtime
    * so a regenerated corpus can never serve stale postings. The oracle
    * is the q76 full-recompute SQL verbatim: identical output certifies
    * the index round-trip (build → append → committed read → score)
    * loses nothing vs scoring raw text, to the last fixed-point bit. */
  def q254Bm25Indexed(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.{BatchIndex, TextRank}
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    // min/max over an empty corpus is the all-NULL row (the r17 q210
    // lesson): return the empty output frame instead of keying an
    // artifact path off a NULL split
    if (r.isNullAt(0)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score_fp6",
          org.apache.spark.sql.types.LongType))))
    val split = (r.getLong(0) + r.getLong(1)) / 2
    val path = graft.core.Artifacts.path(spark, s"$dir/documents.parquet",
      s"bm25idx_ws_s$split")
    if (!BatchIndex.isCommitted(spark, path, 0L))
      TextRank.appendToPostingIndex(docs.filter(col("doc_id") < split),
        "doc_id", "text", path, batchId = 0L)
    if (!BatchIndex.isCommitted(spark, path, 1L))
      TextRank.appendToPostingIndex(docs.filter(col("doc_id") >= split),
        "doc_id", "text", path, batchId = 1L)
    TextRank.bm25TopKIndexed(TextRank.readPostingIndex(spark, path),
      Bm25Queries, k = 10)
  }

  val q254Bm25IndexedSql: String = q76Bm25Sql


  /** Hybrid-retrieval fusion gate: reciprocal-rank fusion (Cormack et
    * al. 2009, the standard hybrid-search combiner) of the q76 BM25
    * lists and brute-force cosine lists over the embedding table —
    * score = Σ_lists 1/(60 + rank), summed over whichever lists the doc
    * appears in (no id-alignment assumption between the doc and vector
    * universes: at sf0.1 only 2000 of 5000 docs have vectors, and RRF's
    * per-list contributions make that well-defined). Query ids are the
    * four q76 queries; the vector side probes those ids' embeddings.
    * Both constituent rankings are integer ranks from already-certified
    * constructions; the fused score is a fixed-order two-term double sum
    * — bit-identical cross-engine, so the gate hash-compares raw. */
  def q95RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val lex = graft.ops.TextRank.bm25TopK(
      Tables.documents(spark, dir), Bm25Queries, "doc_id", "text", k = 20)
      .select(col("query_id"), col("doc_id"), col("rank").as("lrank"))
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = v.filter(col("id").isInCollection(Bm25Queries.map(_._1)))
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val vec = graft.ops.Similarity.bruteForceTopK(v, q, 20)
      .select(col("qid").as("query_id"), col("id").as("doc_id"),
        col("rank").as("vrank"))
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(60.0) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vrank")), lit(0.0))).as("rrf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= 10)
      .select(col("query_id"), col("fused_rank"), col("doc_id"), col("rrf"))
  }

  val q95RrfFusionSql: String = {
    val qids = Bm25Queries.map(_._1).mkString(", ")
    s"""WITH ${bm25Ctes(20)},
      |q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id IN ($qids)),
      |vs AS (
      |  SELECT qid, vec_id AS doc_id,
      |    CAST(row_number() OVER (PARTITION BY qid
      |      ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv) DESC,
      |               vec_id) AS BIGINT) AS vrank
      |  FROM embeddings, q WHERE vec_id <> qid
      |  QUALIFY vrank <= 20),
      |fused AS (
      |  SELECT COALESCE(l.query_id, v.qid) AS query_id,
      |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
      |    COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + l.rank),
      |             CAST(0.0 AS DOUBLE)) +
      |    COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + v.vrank),
      |             CAST(0.0 AS DOUBLE)) AS rrf
      |  FROM lex l FULL OUTER JOIN vs v
      |    ON v.qid = l.query_id AND v.doc_id = l.doc_id)
      |SELECT query_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank,
      |  doc_id, rrf
      |FROM fused
      |QUALIFY fused_rank <= 10""".stripMargin
  }

  /** TextRank keyword gate ([[graft.ops.TextRank.textRankKeywords]]):
    * top-20 corpus keywords by 5-iteration weighted PageRank over the
    * term-adjacency graph. The oracle unrolls the same five iterations
    * as chained CTEs with the identical fixed-point discipline (per-edge
    * contributions rounded to longs before the exact integer sum), so
    * ranks hash-compare with no float tolerance. */
  def q77TextRank(spark: SparkSession, dir: String): DataFrame =
    // NO spread, by measurement (r19 A/B 1.25 → 1.39 s with it): the
    // gate's time is the 5 vocabulary-sized PageRank iterations, not the
    // pair explode — the extra exchange of the text column buys nothing
    graft.ops.TextRank.textRankKeywords(
      Tables.documents(spark, dir), "doc_id", "text", k = 20)

  val q77TextRankSql: String = {
    // one unrolled PageRank iteration: previous ranks rp -> new ranks
    def iter(rp: String, rn: String): String =
      s"""$rn AS (
        |  SELECT dst AS term, 150000 + CAST(round(0.85 * SUM(c)) AS BIGINT) AS r
        |  FROM (
        |    SELECT a.dst, CAST(round((CAST(p.r AS DOUBLE) * a.w) / a.wsrc) AS BIGINT) AS c
        |    FROM adj a JOIN $rp p ON a.src = p.term)
        |  GROUP BY dst)""".stripMargin
    val iters = (1 to 5).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH t AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |pairs AS (
      |  SELECT least(a, b) AS u, greatest(a, b) AS v FROM (
      |    SELECT
      |      unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS a,
      |      unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS b
      |    FROM t WHERE len(toks) >= 2)
      |  WHERE a <> b),
      |und AS (SELECT u, v, COUNT(*) AS w FROM pairs GROUP BY u, v),
      |edges AS (
      |  SELECT u AS src, v AS dst, w FROM und
      |  UNION ALL
      |  SELECT v AS src, u AS dst, w FROM und),
      |wtot AS (SELECT src, SUM(w) AS wsrc FROM edges GROUP BY src),
      |adj AS (SELECT e.src, e.dst, e.w, t.wsrc FROM edges e JOIN wtot t USING (src)),
      |r0 AS (SELECT src AS term, CAST(1000000 AS BIGINT) AS r FROM wtot),
      |$iters
      |SELECT rank, term, score_fp6 FROM (
      |  SELECT CAST(row_number() OVER (ORDER BY r DESC, term) AS BIGINT) AS rank,
      |    term, r AS score_fp6
      |  FROM r5)
      |WHERE rank <= 20""".stripMargin
  }

  /** Unigram-LM quality gate ([[graft.ops.LangModel.selfScore]]):
    * bits-per-token of every document against the corpus's own unigram
    * statistics — the CCNet perplexity-proxy filter in its distributed
    * form. Fixed-point per-token costs make the gate hash-exact; the
    * oracle replays the identical smoothing and expression trees. */
  def q78LmQuality(spark: SparkSession, dir: String): DataFrame =
    graft.ops.LangModel.selfScore(Tables.documents(spark, dir), "doc_id", "text")

  val q78LmQualitySql: String =
    """WITH tok AS (
      |  SELECT doc_id, t AS term
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE t <> ''),
      |counts AS (SELECT term, COUNT(*) AS ct FROM tok GROUP BY term),
      |totals AS (SELECT SUM(ct) AS n_train, COUNT(*) AS v_train FROM counts),
      |costs AS (
      |  SELECT tok.doc_id,
      |    CAST(round(-log2(CAST(coalesce(c.ct, 0) + 1 AS DOUBLE)
      |      / (t.n_train + t.v_train + 1)) * 1e6) AS BIGINT) AS c
      |  FROM tok LEFT JOIN counts c USING (term) CROSS JOIN totals t)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |  CAST(round(CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS BIGINT) AS bits_fp6
      |FROM costs GROUP BY doc_id""".stripMargin

  /** Sliding-window chunking gate ([[graft.ops.TextOps.chunkDocuments]]):
    * 64-token chunks, 16-token overlap (stride 48) — covers multi-chunk
    * docs, the truncated final chunk, and single-chunk short docs. */
  def q82Chunks(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.chunkDocuments(Tables.documents(spark, dir),
      "doc_id", "text", chunkTokens = 64, overlapTokens = 16)

  val q82ChunksSql: String =
    """WITH docs AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |d2 AS (
      |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok
      |  FROM docs WHERE len(toks) > 0),
      |ks AS (
      |  SELECT doc_id, toks, n_tok,
      |    unnest(generate_series(0, greatest(n_tok - 17, 0) // 48)) AS k
      |  FROM d2)
      |SELECT doc_id, k AS chunk_idx, k * 48 + 1 AS tok_start,
      |  least(64, n_tok - (k * 48 + 1) + 1) AS chunk_len,
      |  array_to_string(list_slice(toks, k * 48 + 1, least(n_tok, k * 48 + 64)), ' ')
      |    AS chunk_text
      |FROM ks""".stripMargin

  /** Deterministic stub encoder for the RAG chain: component j of the
    * `dim`-vector is the md5-uniform of (text, j) mapped to [−1, 1),
    * stored as float. A REAL model is a per-partition-initialized scorer
    * (the multimodal decode pattern); the stub keeps every downstream
    * Spark surface — schema, norms, kernels, top-k — real and
    * oracle-replayable. */
  private def stubEmbed(s: org.apache.spark.sql.Column, dim: Int) =
    array((0 until dim).map { j =>
      ((graft.ops.TrainingMix.hex8(concat(s, lit(s"#e$j"))).cast("double") /
        lit(4294967296.0)) * 2 - 1).cast("float")
    }: _*)

  /** q113: the RAG indexing/retrieval CHAIN as one gate — chunk (q82's
    * 64/16 splitter) → embed every chunk (stub encoder above) → exact
    * cosine top-5 chunks for two query strings embedded the same way.
    * Certifies the full chunk→vector→retrieve pipeline end-to-end: the
    * oracle re-derives chunking, embeddings, norms, and ranking. Chunk
    * ids offset by 1000 so the engine's self-pair guard can never
    * collide with a query id. */
  def q113RagPipeline(spark: SparkSession, dir: String): DataFrame = {
    val chunks = graft.ops.TextOps.chunkDocuments(
        Tables.documents(spark, dir), "doc_id", "text", 64, 16)
      .select(
        (col("doc_id") * 100 + col("chunk_idx") + 1000).as("id"),
        col("doc_id"), col("chunk_idx"),
        stubEmbed(col("chunk_text"), 8).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    import spark.implicits._
    val queries = Seq((0L, "table scan fast"), (1L, "stream window batch"))
      .toDF("qid", "qtext")
      .select(col("qid"), stubEmbed(col("qtext"), 8).as("qvec"))
    graft.ops.Similarity
      .bruteForceTopK(chunks.select(col("id"), col("vec")), queries, 5)
      .join(chunks.select(col("id"), col("doc_id"), col("chunk_idx")), "id")
      .select(col("qid"), col("rank"), col("doc_id"), col("chunk_idx"), col("sim"))
  }

  val q113RagPipelineSql: String = {
    import OracleFragments.hex8Sql
    def vecOf(texpr: String) = "[" + (0 until 8).map { j =>
      s"CAST(CAST((${hex8Sql(s"$texpr || '#e$j'")} / 4294967296.0) * 2 - 1 AS REAL) AS DOUBLE)"
    }.mkString(", ") + "]"
    s"""WITH docs AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |d2 AS (
      |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok
      |  FROM docs WHERE len(toks) > 0),
      |ks AS (
      |  SELECT doc_id, toks, n_tok,
      |    unnest(generate_series(0, greatest(n_tok - 17, 0) // 48)) AS k
      |  FROM d2),
      |chunks AS (
      |  SELECT doc_id, k AS chunk_idx,
      |    array_to_string(list_slice(toks, k * 48 + 1, least(n_tok, k * 48 + 64)), ' ')
      |      AS chunk_text
      |  FROM ks),
      |cvec AS (
      |  SELECT doc_id, chunk_idx, ${vecOf("chunk_text")} AS v
      |  FROM chunks),
      |qvec AS (
      |  SELECT qid, ${vecOf("qtext")} AS qv
      |  FROM (VALUES (0, 'table scan fast'), (1, 'stream window batch')) q(qid, qtext)),
      |scored AS (
      |  SELECT q.qid, c.doc_id, c.chunk_idx,
      |    list_cosine_similarity(c.v, q.qv) AS sim
      |  FROM cvec c CROSS JOIN qvec q),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY sim DESC, doc_id * 100 + chunk_idx + 1000) AS rn
      |  FROM scored)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rn AS BIGINT) AS rank,
      |  doc_id, chunk_idx, sim
      |FROM r WHERE rn <= 5""".stripMargin
  }

  /** Feature-hashing TF-IDF gate ([[graft.ops.Features.hashedTfIdf]]):
    * dim=16 over a 31-term vocabulary, so bucket collisions genuinely
    * occur and the gate certifies the collision-SUM semantics, the
    * md5-derived bucket assignment, the smoothed IDF, and the exact
    * fixed-point weighting in one pass. */
  def q85HashedTfIdf(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Features.hashedTfIdf(Tables.documents(spark, dir),
      "doc_id", "text", dim = 16)

  val q85HashedTfIdfSql: String = {
    import OracleFragments.hex8Sql
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, ${hex8Sql("term || '#fh'")} % 16 AS bucket,
      |    COUNT(*) AS tf
      |  FROM tok WHERE term <> '' GROUP BY 1, 2),
      |dfreq AS (SELECT bucket, COUNT(*) AS df FROM tf GROUP BY bucket),
      |stats AS (SELECT COUNT(*) AS n_docs FROM documents),
      |idf AS (
      |  SELECT bucket,
      |    CAST(round((ln((CAST(n_docs AS DOUBLE) + 1.0) /
      |      (CAST(df AS DOUBLE) + 1.0)) + 1.0) * 1e6) AS BIGINT) AS idf_fp6
      |  FROM dfreq, stats)
      |SELECT tf.doc_id, tf.bucket, tf.tf, idf.idf_fp6,
      |  tf.tf * idf.idf_fp6 AS tfidf_fp6
      |FROM tf JOIN idf USING (bucket)""".stripMargin
  }

  val q66PiiRedactionSql: String = {
    val email = graft.ops.TextOps.EmailRe
    val phone = graft.ops.TextOps.PhoneRe
    s"""WITH aug AS (
      |  SELECT doc_id,
      |    text || ' u' || doc_id || '@ex' || (doc_id % 5) || '.org 555-' ||
      |    lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' ||
      |    lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
      |                 '$phone', '<PHONE>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phone
      |FROM aug""".stripMargin
  }

  /** q100: BPE pair induction ([[graft.ops.TextOps.bpePairCounts]]) — the
    * top-20 merge candidates of the first byte-pair-encoding round
    * (corpus-weighted adjacent char pairs + end-of-word markers), ranked
    * with a deterministic (count desc, pair) tiebreak. */
  def q100BpePairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.ops.TextOps.bpePairCounts(Tables.documents(spark, dir), "text")
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(20)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n_occ").desc, col("pair"))).cast("long"))
      .select(col("rank"), col("pair"), col("n_occ"))
  }

  /** q107: batch model scoring — a fixed logistic quality classifier
    * (fastText-style quality-filter shape: bias + log-length + stopword
    * ratio + chars/token + type-token ratio against frozen weights)
    * applied corpus-wide as ONE codegen'd projection: zero shuffles, the
    * 100 TB "inference" pattern when the model is a broadcastable linear
    * head. Scores are fp6-fixed-pointed (the transcendental-guard
    * discipline); `kept` is the downstream filter decision. */
  def q107ModelScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isin("the", "a"))).cast("double") / nTok
    val charsPerTok = col("n_chars").cast("double") / nTok
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    // frozen weights: an offline-trained linear head, shipped as literals
    // (on a cluster: a broadcast variable / artifact — same shape)
    val z = lit(-2.0) + lit(0.45) * log(lit(1.0) + nTok) +
      lit(-3.0) * stopRatio + lit(0.3) * charsPerTok + lit(1.5) * ttr
    val score = lit(1.0) / (lit(1.0) + exp(-z))
    d.select(col("doc_id"),
      round(score * 1e6).cast("long").as("score_fp6"),
      (round(score * 1e6) >= 500000).as("kept"))
  }

  val q107ModelScoreSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'a'))) AS DOUBLE) AS n_stop,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_dist,
      |    CAST(n_chars AS DOUBLE) AS n_chars
      |  FROM documents),
      |z AS (
      |  SELECT doc_id,
      |    -2.0 + 0.45 * ln(1.0 + n_tok) - 3.0 * (n_stop / n_tok)
      |      + 0.3 * (n_chars / n_tok) + 1.5 * (n_dist / n_tok) AS z
      |  FROM f)
      |SELECT doc_id,
      |  CAST(round(1.0 / (1.0 + exp(-z)) * 1e6) AS BIGINT) AS score_fp6,
      |  round(1.0 / (1.0 + exp(-z)) * 1e6) >= 500000 AS kept
      |FROM z""".stripMargin

  /** q109: collocation mining — adjacent-bigram pointwise mutual
    * information over the corpus token stream, the classic phrase-miner
    * ("new york" scores high because it co-occurs far above chance).
    * PMI = ln(N·c_ab / (c_a·c_b)) over unigram/bigram counts, support-
    * filtered (≥ 5) and fp6-fixed-pointed; top-50 by (pmi, bigram). Token
    * and bigram streams are zero-shuffle projections; two hash aggregates
    * (vocab- and bigram-sized) and grid joins do the rest. */
  def q109Collocations(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
    val toks = d.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val total = uni.agg(sum(col("cw")).as("n"))
    val bi = toks
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 5)
    val scored = bi
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c2"), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("cab"),
        // doubles BEFORE the products (mirrors the oracle exactly and
        // avoids long overflow on n·cab at corpus scale)
        round(log(col("n").cast("double") * col("cab") /
          (col("c1").cast("double") * col("c2"))) * 1e6).cast("long").as("pmi_fp6"))
    scored.orderBy(col("pmi_fp6").desc, col("w1"), col("w2")).limit(50)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi_fp6").desc, col("w1"), col("w2"))).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("cab"), col("pmi_fp6"))
  }

  val q109CollocationsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |uni AS (
      |  SELECT w, COUNT(*) AS cw FROM (SELECT unnest(ts) AS w FROM toks)
      |  GROUP BY w),
      |total AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM uni),
      |bi AS (
      |  SELECT ts[CAST(i AS INT) + 1] AS w1, ts[CAST(i AS INT) + 2] AS w2
      |  FROM (SELECT ts, unnest(range(0, len(ts) - 1)) AS i FROM toks)),
      |bic AS (
      |  SELECT w1, w2, COUNT(*) AS cab FROM bi GROUP BY 1, 2
      |  HAVING COUNT(*) >= 5),
      |scored AS (
      |  SELECT b.w1, b.w2, b.cab,
      |    CAST(round(ln(CAST(t.n AS DOUBLE) * b.cab
      |      / (CAST(u1.cw AS DOUBLE) * u2.cw)) * 1e6) AS BIGINT) AS pmi_fp6
      |  FROM bic b
      |  JOIN uni u1 ON u1.w = b.w1
      |  JOIN uni u2 ON u2.w = b.w2
      |  CROSS JOIN total t)
      |SELECT CAST(row_number() OVER (ORDER BY pmi_fp6 DESC, w1, w2) AS BIGINT) AS rank,
      |  w1, w2, cab, pmi_fp6
      |FROM scored
      |ORDER BY pmi_fp6 DESC, w1, w2
      |LIMIT 50""".stripMargin

  val q100BpePairsSql: String =
    """WITH words AS (
      |  SELECT w, COUNT(*) AS wc FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY w),
      |inner_pairs AS (
      |  SELECT substr(w, CAST(i AS INT), 2) AS pair, wc
      |  FROM (SELECT w, wc, unnest(range(1, length(w))) AS i FROM words
      |        WHERE length(w) >= 2)),
      |end_pairs AS (
      |  SELECT substr(w, length(w), 1) || '</w>' AS pair, wc FROM words),
      |agg AS (
      |  SELECT pair, CAST(SUM(wc) AS BIGINT) AS n_occ
      |  FROM (SELECT * FROM inner_pairs UNION ALL SELECT * FROM end_pairs)
      |  GROUP BY pair)
      |SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, pair) AS BIGINT) AS rank,
      |  pair, n_occ
      |FROM agg
      |ORDER BY n_occ DESC, pair
      |LIMIT 20""".stripMargin

  /** Corpus novelty-saturation curve: per 100-doc crawl bucket, the share
    * of its distinct 3-shingles never seen in ANY earlier bucket — the
    * diminishing-returns diagnostic that tells a crawl team when more of
    * the same feed stops adding training signal. First-occurrence is a
    * single gram-keyed aggregate (min doc_id per shingle hash — the q79
    * gram-shuffle shape, prunable the same Bloom way at 100 TB); bucket
    * rollups run on the per-bucket distinct table. */
  def q122NoveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    // spread: the shingle kernel fills the persisted table and was
    // serial on the single-row-group scan (r19)
    val d = Tables.spread(Tables.documents(spark, dir))
    val dsh = d.select(col("doc_id"),
        explode(graft.functions.TextFunctions.distinct_shingles(col("text"), 3)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = dsh.groupBy(col("sh")).agg(min(col("doc_id")).as("fd"))
    val seen = dsh.select(expr("doc_id DIV 100").as("bucket"), col("sh"))
      .distinct()
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_seen"))
    val novel = first.select(expr("fd DIV 100").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_new"))
    seen.join(novel, Seq("bucket"), "left")
      .select(col("bucket"), col("n_seen"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        round(lit(1e6) * coalesce(col("n_new"), lit(0L)) / col("n_seen"))
          .cast("long").as("novelty_fp6"))
  }

  val q122NoveltyCurveSql: String =
    """WITH toks AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |shingles AS (
      |  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
      |  FROM toks a
      |  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
      |dsh AS (SELECT DISTINCT doc_id, sh FROM shingles),
      |first AS (SELECT sh, MIN(doc_id) AS fd FROM dsh GROUP BY sh),
      |seen AS (
      |  SELECT bucket, COUNT(*) AS n_seen FROM (
      |    SELECT DISTINCT doc_id // 100 AS bucket, sh FROM dsh)
      |  GROUP BY bucket),
      |novel AS (SELECT fd // 100 AS bucket, COUNT(*) AS n_new FROM first GROUP BY 1)
      |SELECT s.bucket, CAST(s.n_seen AS BIGINT) AS n_seen,
      |  CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
      |  CAST(round(1e6 * COALESCE(n.n_new, 0) / s.n_seen) AS BIGINT) AS novelty_fp6
      |FROM seen s LEFT JOIN novel n USING (bucket)""".stripMargin

  /** BPE learn + encode ([[graft.ops.TextOps.bpeFertility]]): 4 greedy
    * merges learned on the weighted distinct-word table, applied, and the
    * corpus re-encoded — per-source fertility plus the learned merge
    * sequence itself. The oracle replays every round: pair argmax
    * (cnt desc, a, b tie-break), the lead/lag single-pass merge
    * application, and the final fertility join. */
  def q123BpeFertility(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.bpeFertility(Tables.documents(spark, dir), rounds = 4)

  val q123BpeFertilitySql: String = {
    val rounds = 4
    def bestCte(r: Int, syms: String) =
      s"""best$r AS (
         |  SELECT a, b FROM (
         |    SELECT a, b, SUM(wc) AS cnt FROM (
         |      SELECT w, wc, sym AS a,
         |        lead(sym) OVER (PARTITION BY w ORDER BY pos) AS b
         |      FROM $syms)
         |    WHERE b IS NOT NULL AND a <> b
         |    GROUP BY a, b)
         |  ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin
    def applyCte(r: Int, syms: String) =
      s"""app$r AS (
         |  SELECT s.w, s.wc, s.pos,
         |    CASE WHEN s.sym = m.a AND
         |              lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.pos) = m.b
         |         THEN m.a || m.b ELSE s.sym END AS sym,
         |    CASE WHEN lag(s.sym) OVER (PARTITION BY s.w ORDER BY s.pos) = m.a
         |              AND s.sym = m.b THEN 1 ELSE 0 END AS consumed
         |  FROM $syms s CROSS JOIN best$r m),
         |syms$r AS (
         |  SELECT w, wc,
         |    row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
         |  FROM app$r WHERE consumed = 0)""".stripMargin
    val roundCtes = (1 to rounds)
      .map(r => bestCte(r, s"syms${r - 1}") + ",\n" + applyCte(r, s"syms${r - 1}"))
      .mkString(",\n")
    val mergesExpr = (1 to rounds)
      .map(r => s"(SELECT a || '+' || b FROM best$r)").mkString(" || '|' || ")
    s"""WITH words AS (
      |  SELECT w, COUNT(*) AS wc FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY w),
      |syms0 AS (
      |  SELECT w, wc, CAST(i AS BIGINT) AS pos, substr(w, CAST(i AS INT), 1) AS sym
      |  FROM (SELECT w, wc, unnest(range(1, length(w) + 1)) AS i FROM words)),
      |$roundCtes,
      |nsym AS (SELECT w, COUNT(*) AS n_sym FROM syms$rounds GROUP BY w),
      |fert AS (
      |  SELECT t.source, COUNT(*) AS n_words, SUM(n.n_sym) AS n_tokens
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      |        FROM documents) t
      |  JOIN nsym n ON n.w = t.w
      |  WHERE t.w <> ''
      |  GROUP BY t.source)
      |SELECT source, CAST(n_words AS BIGINT) AS n_words,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(round(1e6 * n_tokens / n_words) AS BIGINT) AS tokens_per_word_fp6,
      |  $mergesExpr AS merges
      |FROM fert""".stripMargin
  }

  /** c-TF-IDF class labeling (the BERTopic topic-labeling statistic,
    * classes = sources): W(t,c) = tf(t,c) · ln(1 + A / f(t)) with A the
    * mean class token mass and f(t) the corpus term frequency; top-5
    * terms per source. ONE corpus shuffle to the (source, term)
    * aggregate; f, A, and the scores all derive from that aggregate (no
    * second corpus scan), and the rank window runs on the class×vocab
    * table, not the corpus. Score is fp6 fixed-point so the hash compare
    * is exact. */
  def q120CtfidfLabels(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
    val st = d.select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f = st.groupBy(col("term")).agg(sum(col("tf")).as("f"))
    val a = st.groupBy(col("source")).agg(sum(col("tf")).as("n"))
      .agg(avg(col("n")).as("aa"))
    val scored = st.join(f, Seq("term")).crossJoin(broadcast(a))
      .select(col("source"), col("term"), col("tf"),
        round(col("tf") * log(lit(1.0) + col("aa") / col("f")) * lit(1e6))
          .cast("long").as("score_fp6"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score_fp6").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank"), col("term"), col("tf"), col("score_fp6"))
  }

  val q120CtfidfLabelsSql: String =
    """WITH st AS (
      |  SELECT source, term, COUNT(*) AS tf FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY 1, 2),
      |f AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS f FROM st GROUP BY term),
      |a AS (SELECT AVG(n) AS aa FROM (
      |  SELECT CAST(SUM(tf) AS BIGINT) AS n FROM st GROUP BY source)),
      |scored AS (
      |  SELECT s.source, s.term, s.tf,
      |    CAST(round(s.tf * ln(1 + a.aa / f.f) * 1e6) AS BIGINT) AS score_fp6
      |  FROM st s JOIN f USING (term) CROSS JOIN a)
      |SELECT source,
      |  CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY score_fp6 DESC, term) AS BIGINT) AS rank,
      |  term, CAST(tf AS BIGINT) AS tf, score_fp6
      |FROM scored
      |QUALIFY rank <= 5""".stripMargin

  /** Vocabulary-coverage / tokenizer-fertility report
    * ([[TextOps.vocabCoverage]]) against the corpus top-16 vocabulary
    * (16 of the 31 distinct corpus tokens, so the OOV path is
    * exercised). */
  def q118VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.vocabCoverage(Tables.documents(spark, dir), vocabSize = 16)

  val q118VocabCoverageSql: String =
    """WITH srctok AS (
      |  SELECT source, tok, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |vocab AS (
      |  SELECT tok FROM (
      |    SELECT tok, SUM(c) AS cnt FROM srctok GROUP BY tok)
      |  QUALIFY row_number() OVER (ORDER BY cnt DESC, tok) <= 16),
      |docstats AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(length(text)) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY source),
      |agg AS (
      |  SELECT s.source, CAST(SUM(s.c) AS BIGINT) AS n_tokens,
      |    CAST(COALESCE(SUM(s.c) FILTER (WHERE v.tok IS NULL), 0) AS BIGINT) AS n_oov
      |  FROM srctok s LEFT JOIN vocab v ON v.tok = s.tok
      |  GROUP BY s.source)
      |SELECT d.source, d.n_docs, a.n_tokens, a.n_oov,
      |  CAST(round(1e6 * a.n_oov / a.n_tokens) AS BIGINT) AS oov_rate_fp6,
      |  CAST(round(1e6 * d.n_chars / a.n_tokens) AS BIGINT) AS chars_per_token_fp6
      |FROM docstats d JOIN agg a USING (source)""".stripMargin

  /** q128: nDCG@10 evaluation of the q76 BM25 ranking against corpus-
    * derived graded relevance (rel = min(query-term occurrences, 4)) —
    * the standard offline retrieval-quality regression a RAG/search
    * pipeline runs after every index rebuild. The oracle replays the
    * whole chain: the BM25 ranking (shared [[bm25Ctes]]), the qrels
    * derivation, and the DCG/IDCG sums with the SAME driver-computed
    * discount literals (no runtime log2 on either engine — see
    * [[graft.ops.TextRank.ndcgDiscounts]]). */
  def q128Ndcg(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextRank.ndcgAtK(
      Tables.documents(spark, dir), Bm25Queries, "doc_id", "text", k = 10)

  val q128NdcgSql: String = {
    val discVals = graft.ops.TextRank.ndcgDiscounts(10)
      .map { case (r, d) => s"($r, ${java.lang.Double.toString(d)})" }
      .mkString(", ")
    s"""WITH ${bm25Ctes(10)},
      |disc(rank, disc) AS (VALUES $discVals),
      |rel AS (
      |  SELECT query_id, doc_id, CAST(least(SUM(tf), 4) AS BIGINT) AS rel
      |  FROM tf GROUP BY 1, 2),
      |sysd AS (
      |  SELECT l.query_id,
      |    CAST(SUM(CAST(round(CAST((1 << COALESCE(r.rel, 0)) - 1 AS DOUBLE)
      |      * d.disc * 1000000000.0) AS BIGINT)) AS BIGINT) AS dcg_fp9
      |  FROM lex l
      |  LEFT JOIN rel r ON r.query_id = l.query_id AND r.doc_id = l.doc_id
      |  JOIN disc d ON d.rank = l.rank
      |  GROUP BY 1),
      |ideal AS (
      |  SELECT query_id, rel,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY rel DESC, doc_id) AS rank
      |  FROM rel QUALIFY rank <= 10),
      |idcg AS (
      |  SELECT i.query_id,
      |    CAST(SUM(CAST(round(CAST((1 << i.rel) - 1 AS DOUBLE)
      |      * d.disc * 1000000000.0) AS BIGINT)) AS BIGINT) AS idcg_fp9
      |  FROM ideal i JOIN disc d ON d.rank = i.rank
      |  GROUP BY 1)
      |SELECT s.query_id, s.dcg_fp9, i.idcg_fp9,
      |  CAST(round(CAST(s.dcg_fp9 AS DOUBLE) / i.idcg_fp9 * 1000000.0)
      |    AS BIGINT) AS ndcg_fp6
      |FROM sysd s JOIN idcg i USING (query_id)""".stripMargin
  }

  /** q137: Zipf-slope audit per source — the least-squares slope of
    * ln(freq) vs ln(rank) over each source's top-200 terms. Natural text
    * sits near −1; a source drifting far off (template spam, tag soup,
    * machine-generated filler) flags itself in one number, which makes
    * this a standard corpus-health panel entry alongside q19/q97.
    * Scale shape: one (source, term) count (THE corpus shuffle), a
    * per-source top-200 rank that compiles to WindowGroupLimit, and a
    * 200-row-per-source regression. Determinism: the two ln() calls are
    * rounded to 1e-6 fixed-point longs per term, all regression sums are
    * exact integer sums of their products (magnitudes < 2⁶³ by
    * construction: |x_fp6| ≤ ln(200)·1e6, 200 terms), and the slope is
    * one double division of exact integers. */
  def q137ZipfSlope(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("freq"))
    val wRank = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("tok"))
    val pts = tf
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= 200)
      .select(col("source"),
        round(log(col("rank").cast("double")) * lit(1e6)).cast("long").as("x"),
        round(log(col("freq").cast("double")) * lit(1e6)).cast("long").as("y"))
    pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n_terms"),
        round((col("n_terms") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n_terms") * col("sxx") - col("sx") * col("sx")) * lit(1e6))
          .cast("long").as("slope_fp6"))
  }

  /** q141 search patterns — one deliberately unmatchable (gram misses). */
  val SearchPatterns: Seq[(Long, String)] = Seq(
    1L -> "key order", 2L -> "spark stream", 3L -> "window dup",
    4L -> "zzz qqq")

  /** q141: trigram-inverted-index substring search (the pg_trgm/LIKE-
    * acceleration pattern): distinct (trigram, doc) postings built once;
    * each query prunes to docs containing ALL its trigrams (k-way posting
    * intersection as one aggregation) before the exact contains() verify
    * reads any text. The oracle replays postings, intersection, and
    * verify — certifying both the index construction and the necessary-
    * condition logic (candidates ⊇ matches, including the zero-match
    * pattern). See [[graft.ops.NgramIndex]] for the scale shape. */
  def q141TrigramSearch(spark: SparkSession, dir: String): DataFrame =
    // spread: the gram kernel is compute-bound and runs pre-shuffle — on a
    // single-row-group corpus one task would build every posting (the q24
    // discipline)
    graft.ops.NgramIndex.substringSearch(
      Tables.spread(Tables.documents(spark, dir)), "doc_id", "text",
      SearchPatterns)

  val q141TrigramSearchSql: String = {
    val patVals = SearchPatterns
      .map { case (pid, p) => s"($pid, '$p')" }.mkString(", ")
    val pgVals = SearchPatterns
      .flatMap { case (pid, p) => p.sliding(3).toSeq.distinct.map(g => s"($pid, '$g')") }
      .mkString(", ")
    s"""WITH pat(pattern_id, pat) AS (VALUES $patVals),
      |pg(pattern_id, g) AS (VALUES $pgVals),
      |ng AS (SELECT pattern_id, COUNT(*) AS ng FROM pg GROUP BY 1),
      |pos AS (
      |  SELECT doc_id, text,
      |    unnest(generate_series(1, length(text) - 2)) AS i
      |  FROM documents WHERE length(text) >= 3),
      |grams AS (SELECT DISTINCT doc_id, substr(text, i, 3) AS g FROM pos),
      |hits AS (
      |  SELECT p.pattern_id, g.doc_id, COUNT(*) AS hit
      |  FROM grams g JOIN pg p USING (g) GROUP BY 1, 2),
      |cand AS (
      |  SELECT h.pattern_id, h.doc_id
      |  FROM hits h JOIN ng USING (pattern_id) WHERE h.hit = ng.ng),
      |ver AS (
      |  SELECT c.pattern_id, c.doc_id
      |  FROM cand c
      |  JOIN documents d ON d.doc_id = c.doc_id
      |  JOIN pat p ON p.pattern_id = c.pattern_id
      |  WHERE contains(d.text, p.pat)),
      |ccount AS (SELECT pattern_id, COUNT(*) AS n_candidates FROM cand GROUP BY 1),
      |vcount AS (SELECT pattern_id, COUNT(*) AS n_matched FROM ver GROUP BY 1)
      |SELECT CAST(p.pattern_id AS BIGINT) AS pattern_id,
      |  COALESCE(c.n_candidates, 0) AS n_candidates,
      |  COALESCE(v.n_matched, 0) AS n_matched
      |FROM pat p
      |LEFT JOIN ccount c ON c.pattern_id = p.pattern_id
      |LEFT JOIN vcount v ON v.pattern_id = p.pattern_id""".stripMargin
  }

  val q137ZipfSlopeSql: String =
    """WITH tf AS (
      |  SELECT source, tok, COUNT(*) AS freq FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE tok <> '' GROUP BY 1, 2),
      |pts AS (
      |  SELECT source,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
      |    CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
      |  FROM (
      |    SELECT source, freq,
      |      CAST(row_number() OVER (PARTITION BY source
      |        ORDER BY freq DESC, tok) AS BIGINT) AS rank
      |    FROM tf QUALIFY rank <= 200)),
      |agg AS (
      |  SELECT source, COUNT(*) AS n_terms,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM pts GROUP BY source)
      |SELECT source, n_terms,
      |  CAST(round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
      |    / (n_terms * sxx - sx * sx) * 1000000.0) AS BIGINT) AS slope_fp6
      |FROM agg""".stripMargin

  /** q169: per-source boilerplate-gram report — the RefinedWeb/CCNet
    * "repeated lines within a domain" curation signal, expressed over
    * 3-token shingles (this corpus has no line structure): a gram that
    * recurs across ≥2 DISTINCT documents of the same source is navigation/
    * template boilerplate, not content, and a doc-level dedup pass never
    * sees it. Per source: distinct boilerplate grams, the worst gram's
    * document reach, and how many documents carry at least one.
    *
    * Scale shape: the per-doc distinct-shingle kernel
    * ([[graft.functions.DistinctShinglesExpr]]) is a zero-shuffle
    * projection; the (source, gram) aggregate shuffles one row per
    * distinct gram occurrence — WITHIN-source grouping, so the shuffle
    * key carries the source and per-domain skew salts naturally; the
    * affected-doc count is a semi-join reusing the same partitioning.
    * Singleton grams dominate (q79 measurement: ~91%) and prune the same
    * Bloom way at 100 TB. */
  def q169Boilerplate(spark: SparkSession, dir: String): DataFrame = {
    // spread: the shingle kernel fills the persisted table and was
    // serial on the single-row-group scan (r19)
    val d = Tables.spread(Tables.documents(spark, dir))
    val dsh = d.select(col("source"), col("doc_id"),
        explode(graft.functions.TextFunctions.distinct_shingles(col("text"), 3)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boiler = dsh.groupBy(col("source"), col("sh"))
      .agg(count(lit(1)).as("nd")) // dsh is distinct per doc by kernel contract
      .filter(col("nd") >= 2)
    val per = boiler.groupBy(col("source"))
      .agg(count(lit(1)).as("n_boiler_grams"), max(col("nd")).as("max_gram_docs"))
    val affected = dsh
      .join(boiler.select(col("source"), col("sh")), Seq("source", "sh"), "left_semi")
      .select(col("source"), col("doc_id")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs_affected"))
    d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(per, Seq("source"), "left")
      .join(affected, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_boiler_grams"), lit(0L)).as("n_boiler_grams"),
        coalesce(col("max_gram_docs"), lit(0L)).as("max_gram_docs"),
        coalesce(col("n_docs_affected"), lit(0L)).as("n_docs_affected"))
  }

  val q169BoilerplateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |shingles AS (
      |  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
      |  FROM toks a
      |  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
      |dsh AS (
      |  SELECT DISTINCT d.source, s.doc_id, s.sh
      |  FROM shingles s JOIN documents d USING (doc_id)),
      |boiler AS (
      |  SELECT source, sh, COUNT(*) AS nd FROM dsh
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |per AS (
      |  SELECT source, COUNT(*) AS n_boiler_grams, MAX(nd) AS max_gram_docs
      |  FROM boiler GROUP BY 1),
      |aff AS (
      |  SELECT g.source, COUNT(DISTINCT g.doc_id) AS n_docs_affected
      |  FROM dsh g JOIN boiler b ON b.source = g.source AND b.sh = g.sh
      |  GROUP BY 1),
      |tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
      |SELECT t.source, t.n_docs,
      |  CAST(COALESCE(p.n_boiler_grams, 0) AS BIGINT) AS n_boiler_grams,
      |  CAST(COALESCE(p.max_gram_docs, 0) AS BIGINT) AS max_gram_docs,
      |  CAST(COALESCE(a.n_docs_affected, 0) AS BIGINT) AS n_docs_affected
      |FROM tot t LEFT JOIN per p USING (source) LEFT JOIN aff a USING (source)""".stripMargin

  /** q197: language-ID confusion matrix — the n-gram classifier
    * ([[graft.ops.TextOps.langId]], the q19/q27 kernel) evaluated
    * against the labeled `lang` column: per (truth, prediction) cell,
    * the count plus its row share (recall on the diagonal) and column
    * share (precision on the diagonal). The eval every langid filter
    * deployment reads before trusting per-language mix decisions.
    *
    * Scale shape: the classifier is a zero-shuffle codegen'd
    * projection; the matrix is a languages²-sized aggregate, and both
    * share windows run over those few rows. */
  def q197LangConfusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(spark, dir)
      .select(col("lang").as("lang_true"),
        graft.ops.TextOps.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang_true"), col("lang_pred")).agg(count(lit(1)).as("n"))
    cells.select(col("lang_true"), col("lang_pred"), col("n"),
      round(lit(1e6) * col("n") /
        sum(col("n")).over(Window.partitionBy(col("lang_true"))))
        .cast("long").as("row_share_fp6"),
      round(lit(1e6) * col("n") /
        sum(col("n")).over(Window.partitionBy(col("lang_pred"))))
        .cast("long").as("col_share_fp6"))
  }

  val q197LangConfusionSql: String =
    s"""WITH s AS (
      |  SELECT lang AS lang_true,
      |    ${OracleFragments.langScoreCols}
      |  FROM documents),
      |p AS (
      |  SELECT lang_true, ${OracleFragments.langPredCase} AS lang_pred
      |  FROM s),
      |cells AS (
      |  SELECT lang_true, lang_pred, COUNT(*) AS n FROM p GROUP BY 1, 2)
      |SELECT lang_true, lang_pred, n,
      |  CAST(round(1e6 * n / SUM(n) OVER (PARTITION BY lang_true))
      |    AS BIGINT) AS row_share_fp6,
      |  CAST(round(1e6 * n / SUM(n) OVER (PARTITION BY lang_pred))
      |    AS BIGINT) AS col_share_fp6
      |FROM cells""".stripMargin

  /** q207: token dispersion across sources — Gries' DP ("deviation of
    * proportions", Gries 2008) for the corpus's top-50 tokens:
    * `DP = ½·Σ_s |v_ts − p_s|` where `v_ts` is the token's share in
    * source s and `p_s` the source's share of all tokens. DP ≈ 0 means
    * the token spreads like the corpus does; DP → 1 means it lives in
    * one source — exactly the signal that separates a genuine
    * stopword from a boilerplate artifact of a single crawl, which
    * q169's gram report sees per-source and this measures corpus-wide.
    *
    * Determinism: per-cell terms are fp9-rounded integers before the
    * sum (q97/q181 discipline); the shares divide exact integers.
    * Scale shape: ONE corpus aggregate to (tok, source) cells
    * (barriered; feeds token totals, source totals, and the grid
    * attach); everything downstream is top-50 × sources sized. */
  def q207TokenDispersion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"), col("source")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val top = tc.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("ct").desc, col("tok"))))
      .filter(col("rn") <= 50).drop("rn")
    val srcTot = tc.groupBy(col("source")).agg(sum(col("c")).as("ws"))
    val wTot = srcTot.agg(sum(col("ws")).as("w"))
    top.crossJoin(broadcast(srcTot)).crossJoin(broadcast(wTot))
      .join(tc, Seq("tok", "source"), "left")
      .select(col("tok"), col("ct"),
        round(lit(1e9) * abs(
          coalesce(col("c"), lit(0L)).cast("double") / col("ct") -
          col("ws").cast("double") / col("w"))).cast("long").as("term_fp9"))
      .groupBy(col("tok"), col("ct"))
      .agg(round(sum(col("term_fp9")).cast("double") / lit(2000.0)).cast("long")
        .as("dp_fp6"))
      .select(col("tok"), col("ct").as("total_ct"), col("dp_fp6"))
  }

  val q207TokenDispersionSql: String =
    """WITH tc AS (
      |  SELECT tok, source, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  WHERE tok <> '' GROUP BY 1, 2),
      |tokTot AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ct FROM tc GROUP BY 1),
      |top AS (
      |  SELECT tok, ct FROM (
      |    SELECT tok, ct, row_number() OVER (ORDER BY ct DESC, tok) AS rn
      |    FROM tokTot) WHERE rn <= 50),
      |srcTot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ws FROM tc GROUP BY 1),
      |w AS (SELECT CAST(SUM(ws) AS BIGINT) AS w FROM srcTot),
      |grid AS (
      |  SELECT t.tok, t.ct,
      |    CAST(round(1e9 * abs(CAST(COALESCE(c.c, 0) AS DOUBLE) / t.ct
      |      - CAST(s.ws AS DOUBLE) / w.w)) AS BIGINT) AS term_fp9
      |  FROM top t CROSS JOIN srcTot s CROSS JOIN w
      |  LEFT JOIN tc c ON c.tok = t.tok AND c.source = s.source)
      |SELECT tok, ct AS total_ct,
      |  CAST(round(CAST(SUM(term_fp9) AS DOUBLE) / 2000.0) AS BIGINT)
      |    AS dp_fp6
      |FROM grid GROUP BY 1, 2""".stripMargin

  /** q202: per-source PII risk report — the release-gate table next to
    * q66's row-level redaction: how MUCH obvious PII each source
    * carries (doc shares with an email, a phone, both, and total match
    * counts), which decides whether a source enters the mix as-is,
    * post-redaction, or not at all. Like q66, PII is injected
    * deterministically (emails on `doc_id % 7 = 0`, phones on
    * `% 11 = 0`) because the synthetic corpus carries none — the
    * counting/reporting machinery under audit is real.
    *
    * Scale shape: two codegen'd regexp_count projections folding into
    * a source-sized aggregate — one scan, no joins, linear in bytes. */
  def q202PiiRisk(spark: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" u"), col("doc_id"), lit("@ex"), col("doc_id") % 5,
          lit(".org"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
          lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    val d = Tables.documents(spark, dir)
      .select(col("source"),
        graft.ops.TextOps.emailCount(aug).cast("long").as("ne"),
        graft.ops.TextOps.phoneCount(aug).cast("long").as("np"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ne") > 0, lit(1L)).otherwise(lit(0L))).as("docs_email"),
        sum(when(col("np") > 0, lit(1L)).otherwise(lit(0L))).as("docs_phone"),
        sum(when(col("ne") > 0 && col("np") > 0, lit(1L)).otherwise(lit(0L)))
          .as("docs_both"),
        sum(col("ne")).as("total_emails"), sum(col("np")).as("total_phones"))
      .select(col("source"), col("n_docs"), col("docs_email"),
        col("docs_phone"), col("docs_both"), col("total_emails"),
        col("total_phones"),
        round(lit(1e6) * (col("docs_email") + col("docs_phone") - col("docs_both"))
          / col("n_docs")).cast("long").as("pii_share_fp6"))
  }

  val q202PiiRiskSql: String = {
    val email = graft.ops.TextOps.EmailRe
    val phone = graft.ops.TextOps.PhoneRe
    s"""WITH aug AS (
      |  SELECT source,
      |    text ||
      |    (CASE WHEN doc_id % 7 = 0
      |      THEN ' u' || doc_id || '@ex' || (doc_id % 5) || '.org'
      |      ELSE '' END) ||
      |    (CASE WHEN doc_id % 11 = 0
      |      THEN ' 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' ||
      |        lpad((doc_id % 10000)::VARCHAR, 4, '0')
      |      ELSE '' END) AS t
      |  FROM documents),
      |c AS (
      |  SELECT source,
      |    CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS ne,
      |    CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS np
      |  FROM aug)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
      |  CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_phone,
      |  CAST(SUM(CASE WHEN ne > 0 AND np > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_both,
      |  CAST(SUM(ne) AS BIGINT) AS total_emails,
      |  CAST(SUM(np) AS BIGINT) AS total_phones,
      |  CAST(round(1e6 * (SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END)
      |      + SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END)
      |      - SUM(CASE WHEN ne > 0 AND np > 0 THEN 1 ELSE 0 END))
      |    / COUNT(*)) AS BIGINT) AS pii_share_fp6
      |FROM c GROUP BY source""".stripMargin
  }

  /** q216: distinct-n lexical diversity per source (Li et al. 2016's
    * distinct-1/-2 generalized to n = 1..3): unique n-grams over total
    * n-grams — the corpus-level diversity number next to the WITHIN-doc
    * repetition signals (q59) and the CROSS-source dispersion table
    * (q207). A crawl dominated by templated boilerplate shows high doc
    * counts but a collapsing distinct-2/-3 ratio; a model trained on it
    * inherits the loops. Totals are exact integers computed
    * ARITHMETICALLY from per-doc token counts (a doc with t tokens has
    * `max(0, t−n+1)` n-grams — no explode needed); only the distinct
    * side touches gram space.
    *
    * Scale shape: one corpus scan explodes (n, md5(gram)) pairs — grams
    * travel as md5 keys, never strings (the q93 discipline) — into a
    * distinct + count two-level aggregate (both map-side combined);
    * totals are a second narrow scan of per-doc counts. Output is
    * sources-sized. */
  def q216DistinctN(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextOps
    val base = Tables.spread(Tables.documents(spark, dir))
      .select(col("source"), split(col("text"), " ").as("ts"))
    val t = size(col("ts")).cast("long")
    val tot = base
      .select(col("source"), t.as("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("tot1"),
        sum(greatest(col("t") - 1, lit(0L))).as("tot2"),
        sum(greatest(col("t") - 2, lit(0L))).as("tot3"))
    def tagged(n: Int) = transform(TextOps.shingles(col("ts"), n),
      g => struct(lit(n).as("n"), md5(g).as("h")))
    val uniq = base
      .select(col("source"),
        explode(flatten(array(tagged(1), tagged(2), tagged(3)))).as("g"))
      .select(col("source"), col("g.n"), col("g.h"))
      .distinct()
      .groupBy(col("source"))
      .agg(sum(when(col("n") === 1, 1L).otherwise(0L)).as("uniq1"),
        sum(when(col("n") === 2, 1L).otherwise(0L)).as("uniq2"),
        sum(when(col("n") === 3, 1L).otherwise(0L)).as("uniq3"))
    def ratio(u: String, tt: String) =
      when(col(tt) > 0, round(lit(1e6) * col(u).cast("double") / col(tt))
        .cast("long"))
    tot.join(uniq, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        col("tot1"), coalesce(col("uniq1"), lit(0L)).as("uniq1"),
        col("tot2"), coalesce(col("uniq2"), lit(0L)).as("uniq2"),
        col("tot3"), coalesce(col("uniq3"), lit(0L)).as("uniq3"))
      .select(col("source"), col("n_docs"), col("tot1"), col("uniq1"),
        ratio("uniq1", "tot1").as("d1_fp6"), col("tot2"), col("uniq2"),
        ratio("uniq2", "tot2").as("d2_fp6"), col("tot3"), col("uniq3"),
        ratio("uniq3", "tot3").as("d3_fp6"))
  }

  val q216DistinctNSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
      |tot AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(ts)) AS BIGINT) AS tot1,
      |    CAST(SUM(GREATEST(len(ts) - 1, 0)) AS BIGINT) AS tot2,
      |    CAST(SUM(GREATEST(len(ts) - 2, 0)) AS BIGINT) AS tot3
      |  FROM toks GROUP BY 1),
      |uni AS (
      |  SELECT source, doc_id, generate_subscripts(ts, 1) AS pos,
      |    unnest(ts) AS tok
      |  FROM toks),
      |u1 AS (SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS uniq1
      |       FROM uni GROUP BY 1),
      |u2 AS (SELECT a.source,
      |    CAST(COUNT(DISTINCT a.tok || ' ' || b.tok) AS BIGINT) AS uniq2
      |  FROM uni a JOIN uni b
      |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |  GROUP BY 1),
      |u3 AS (SELECT a.source,
      |    CAST(COUNT(DISTINCT a.tok || ' ' || b.tok || ' ' || c.tok)
      |      AS BIGINT) AS uniq3
      |  FROM uni a JOIN uni b
      |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |  JOIN uni c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      |  GROUP BY 1)
      |SELECT t.source, t.n_docs,
      |  t.tot1, COALESCE(u1.uniq1, 0) AS uniq1,
      |  CASE WHEN t.tot1 > 0 THEN
      |    CAST(round(1e6 * COALESCE(u1.uniq1, 0) / t.tot1) AS BIGINT)
      |  END AS d1_fp6,
      |  t.tot2, COALESCE(u2.uniq2, 0) AS uniq2,
      |  CASE WHEN t.tot2 > 0 THEN
      |    CAST(round(1e6 * COALESCE(u2.uniq2, 0) / t.tot2) AS BIGINT)
      |  END AS d2_fp6,
      |  t.tot3, COALESCE(u3.uniq3, 0) AS uniq3,
      |  CASE WHEN t.tot3 > 0 THEN
      |    CAST(round(1e6 * COALESCE(u3.uniq3, 0) / t.tot3) AS BIGINT)
      |  END AS d3_fp6
      |FROM tot t
      |LEFT JOIN u1 ON u1.source = t.source
      |LEFT JOIN u2 ON u2.source = t.source
      |LEFT JOIN u3 ON u3.source = t.source""".stripMargin

  /** q217 lives in [[Events]] (user-lifetime survival); q218 below. */

  /** q218: Good–Turing frequency spectrum of 3-gram types per language
    * (Good 1953; the estimator behind Katz back-off smoothing) — the
    * frequency-of-frequencies table `n_r` (trigram types seen exactly
    * r times, r ≤ 5), the unseen-probability mass estimate `p0 =
    * n1/N`, and the Turing-adjusted count for singletons `r*_1 =
    * 2·n2/n1`. This is the principled "how much of the language have
    * we NOT crawled yet" number that q118's fixed-list coverage and
    * q60's novelty curve cannot give: a language whose trigram mass is
    * 60% singletons (en measures p0 ≈ 0.63 at sf0.01) is nowhere near
    * saturated, and per-language p0 tells the mix planner which
    * languages need more CRAWL, not more epochs. Trigrams (not
    * unigrams) because a fixed synthetic vocabulary saturates at any
    * corpus size — the n-gram spectrum is where unseen mass actually
    * lives, exactly as in LM smoothing. Every count is an exact
    * integer; the two closing ratios are single IEEE divisions rounded
    * once.
    *
    * Scale shape: trigrams travel as md5 keys into a (lang, gram)
    * count — the one gram-space aggregate, map-side combined — then
    * the spectrum folds to languages × 7 counters. No joins, no
    * windows. */
  def q218GoodTuring(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"),
        explode(graft.ops.TextOps.shingles(split(col("text"), " "), 3))
          .as("g"))
      .groupBy(col("lang"), md5(col("g")).as("h"))
      .agg(count(lit(1)).as("c"))
    def nr(r: Int) = sum(when(col("c") === r, 1L).otherwise(0L)).as(s"n$r")
    tf.groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
        nr(1), nr(2), nr(3), nr(4), nr(5))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        col("n1"), col("n2"), col("n3"), col("n4"), col("n5"),
        round(lit(1e9) * col("n1").cast("double") / col("n_tokens"))
          .cast("long").as("p0_fp9"),
        when(col("n1") > 0,
          round(lit(1e6) * lit(2.0) * col("n2").cast("double") / col("n1"))
            .cast("long")).as("r1_star_fp6"))
  }

  val q218GoodTuringSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
      |uni AS (
      |  SELECT doc_id, lang, generate_subscripts(ts, 1) AS pos,
      |    unnest(ts) AS tok
      |  FROM toks),
      |tf AS (
      |  SELECT a.lang, a.tok || ' ' || b.tok || ' ' || c.tok AS g,
      |    COUNT(*) AS c
      |  FROM uni a
      |  JOIN uni b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |  JOIN uni c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      |  GROUP BY 1, 2),
      |sp AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS vocab,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
      |    CAST(SUM(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
      |    CAST(SUM(CASE WHEN c = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n5
      |  FROM tf GROUP BY 1)
      |SELECT lang, n_tokens, vocab, n1, n2, n3, n4, n5,
      |  CAST(round(1e9 * CAST(n1 AS DOUBLE) / n_tokens) AS BIGINT)
      |    AS p0_fp9,
      |  CASE WHEN n1 > 0 THEN
      |    CAST(round(1e6 * 2.0 * CAST(n2 AS DOUBLE) / n1) AS BIGINT)
      |  END AS r1_star_fp6
      |FROM sp""".stripMargin

  /** q220: Zipf's-law fit per language — OLS slope/intercept of
    * ln(frequency) against ln(rank) over the top-300 unigram ranks.
    * Each log term is fp9-rounded to an exact integer BEFORE the
    * regression sums (order-free across engines); the sums accumulate in
    * Decimal(38,0) (x9·y9 products reach ~7·10¹⁹, past Long.MaxValue),
    * and the closed-form slope runs the exact-integer centered-moment
    * form (n·Σxy − ΣxΣy) shared with q219.
    *
    * Scale: term frequency is a map-side-combined aggregate; the rank
    * window then runs over the VOCABULARY-sized tf table (not the
    * corpus), partitioned by language. At 100 TB vocab per language is
    * still large — the production path for the rank cut is a two-phase
    * top-k (per-partition heaps, then top-300 of the ≤300·P partials);
    * here the per-lang window keeps the gate on the exact same built-in
    * operator the oracle runs.
    */
  def q220ZipfSlope(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val topN = 300
    val tf = Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
    val ranked = tf
      .withColumn("r", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("c").desc, col("tok"))))
      .filter(col("r") <= topN)
      .select(col("lang"),
        round(log(col("r").cast("double")) * lit(1e9)).cast("long").as("x9"),
        round(log(col("c").cast("double")) * lit(1e9)).cast("long").as("y9"))
    def dsum1(a: Column) = sum(a.cast(DecimalType(38, 0)))
    def dsum(a: Column, b: Column) =
      sum(a.cast(DecimalType(38, 0)) * b.cast(DecimalType(38, 0)))
    val s = ranked.groupBy(col("lang")).agg(count(lit(1)).as("n"),
      dsum1(col("x9")).as("sx"), dsum1(col("y9")).as("sy"),
      dsum(col("x9"), col("x9")).as("sxx"),
      dsum(col("x9"), col("y9")).as("sxy"))
    val nDec = col("n").cast(DecimalType(38, 0))
    val mxy = (nDec * col("sxy") - col("sx") * col("sy")).cast("double")
    val mxx = (nDec * col("sxx") - col("sx") * col("sx")).cast("double")
    val slope = mxy / mxx
    // sums are in 1e9-units of ln: dividing the intercept by 1e3 lands fp6
    val icept = (col("sy").cast("double") - slope * col("sx").cast("double")) /
      col("n").cast("double") / lit(1e3)
    s.select(col("lang"), col("n").as("n_ranks"),
      round(slope * lit(1e6)).cast("long").as("slope_fp6"),
      round(icept).cast("long").as("icept_fp6"))
  }

  val q220ZipfSlopeSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (
      |  SELECT lang, tok, COUNT(*) AS c FROM tok
      |  WHERE len(tok) > 0 GROUP BY 1, 2),
      |rk AS (
      |  SELECT lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS r, c
      |  FROM tf),
      |xy AS (
      |  SELECT lang,
      |    CAST(round(ln(CAST(r AS DOUBLE)) * 1e9) AS BIGINT) AS x9,
      |    CAST(round(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT) AS y9
      |  FROM rk WHERE r <= 300),
      |s AS (
      |  SELECT lang, COUNT(*) AS n,
      |    SUM(CAST(x9 AS HUGEINT)) AS sx, SUM(CAST(y9 AS HUGEINT)) AS sy,
      |    SUM(CAST(x9 AS HUGEINT) * CAST(x9 AS HUGEINT)) AS sxx,
      |    SUM(CAST(x9 AS HUGEINT) * CAST(y9 AS HUGEINT)) AS sxy
      |  FROM xy GROUP BY 1),
      |m AS (
      |  SELECT lang, n,
      |    CAST(n * sxy - sx * sy AS DOUBLE) AS mxy,
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS mxx,
      |    CAST(sx AS DOUBLE) AS sxf, CAST(sy AS DOUBLE) AS syf
      |  FROM s)
      |SELECT lang, n AS n_ranks,
      |  CAST(round(mxy / mxx * 1e6) AS BIGINT) AS slope_fp6,
      |  CAST(round((syf - mxy / mxx * sxf) / CAST(n AS DOUBLE) / 1e3)
      |    AS BIGINT) AS icept_fp6
      |FROM m""".stripMargin

  /** q227: word2vec-style negative-sampling table — the unigram
    * distribution raised to 3/4 (Mikolov's smoothing, which lifts rare
    * words and damps head words), materialized as the top-50 rows with
    * exact sampling probability and cumulative mass (the inverse-CDF
    * lookup a trainer samples against). Weights are fp6-rounded integers
    * (one pow per distinct token, order-free) and the normalizer is the
    * exact integer sum over the FULL vocabulary, so probabilities and
    * the running CDF are identical across engines.
    *
    * Scale: one map-side-combined tf aggregate; the normalizer is a
    * scalar aggregate broadcast back; top-50 plans as
    * TakeOrderedAndProject. Building the full inverse-CDF table at 100 TB
    * is the same plan minus the limit, partitioned by cumulative-mass
    * range.
    */
  def q227NegSampling(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.spread(Tables.documents(spark, dir))
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .select(col("tok"), col("c"),
        round(pow(col("c").cast("double"), 0.75) * lit(1e6))
          .cast("long").as("w6"))
    val tot = tf.agg(sum(col("w6")).as("tot"))
    val top = tf.orderBy(col("c").desc, col("tok")).limit(50)
      .crossJoin(broadcast(tot))
      .select(col("tok"), col("c"), col("w6"),
        round(lit(1e9) * col("w6").cast("double") /
          col("tot").cast("double")).cast("long").as("p9"))
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("tok")))
          .cast("long"))
      .withColumn("cum_p9",
        sum(col("p9")).over(Window.orderBy(col("rank"))))
      .select(col("rank"), col("tok"), col("c"), col("w6"), col("p9"),
        col("cum_p9"))
  }

  val q227NegSamplingSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (
      |  SELECT tok, COUNT(*) AS c,
      |    CAST(round(pow(CAST(COUNT(*) AS DOUBLE), 0.75) * 1e6) AS BIGINT)
      |      AS w6
      |  FROM tok WHERE len(tok) > 0 GROUP BY tok),
      |t AS (SELECT CAST(SUM(w6) AS BIGINT) AS tot FROM tf),
      |r AS (
      |  SELECT tok, c, w6,
      |    CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rank
      |  FROM tf),
      |top AS (
      |  SELECT r.rank, r.tok, r.c, r.w6,
      |    CAST(round(1e9 * CAST(r.w6 AS DOUBLE) / CAST(t.tot AS DOUBLE))
      |      AS BIGINT) AS p9
      |  FROM r, t WHERE r.rank <= 50)
      |SELECT rank, tok, c, w6, p9,
      |  CAST(SUM(p9) OVER (ORDER BY rank) AS BIGINT) AS cum_p9
      |FROM top""".stripMargin
}
