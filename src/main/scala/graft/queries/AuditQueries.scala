package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-audit gates: rule-based quality filtering (q142), bigram
  * language-model scoring (q144), and information-theoretic metadata
  * association (q147). All three are dataset-card material — the numbers a
  * curation team reads before deciding mix weights and filter thresholds.
  */
object AuditQueries {

  /** q142: Gopher-style rule-based quality report (Rae et al. 2021,
    * "Scaling Language Models: … Gopher", Table A1 — the repetition and
    * quality heuristics, adapted to this corpus's signals): per document,
    * token-count bounds, mean-token-length bounds, stopword floor, top-
    * token repetition cap, and a type-token-ratio floor; reported as
    * per-source pass/fail counts (the form a mix-weight decision reads).
    *
    * Scale shape: every signal INCLUDING the top-token frequency is a
    * per-row projection — the codegen'd
    * [[graft.functions.TopTokenFreqExpr]] kernel (one O(n) hash pass; the
    * oracle certifies it against the explode/groupBy form) — so the only
    * shuffle is the final source-sized aggregate. All rule arithmetic is
    * integer cross-multiplication — no floating point anywhere. */
  def q142GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val d = Tables.documents(spark, dir).select(
      col("source"),
      size(toks).cast("long").as("n_tok"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      size(filter(toks, t => t.isin("the", "a"))).cast("long").as("n_stop"),
      (col("n_chars") - size(toks) + 1).cast("long").as("tokchars"),
      graft.functions.TextFunctions.top_token_freq(col("text")).as("top_freq"))
    val pLen  = (col("n_tok") >= 20 && col("n_tok") <= 1000).cast("long")
    val pWl   = (col("n_tok") * 3 <= col("tokchars") &&
                 col("tokchars") <= col("n_tok") * 5).cast("long")
    val pStop = (col("n_stop") >= 2).cast("long")
    val pRep  = (col("top_freq") * 8 <= col("n_tok")).cast("long")
    val pTtr  = (col("n_distinct") * 10 >= col("n_tok") * 3).cast("long")
    d.select(col("source"), pLen.as("p_len"), pWl.as("p_wl"),
        pStop.as("p_stop"), pRep.as("p_rep"), pTtr.as("p_ttr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("p_len") * col("p_wl") * col("p_stop") * col("p_rep") *
          col("p_ttr")).as("n_pass"),
        (count(lit(1)) - sum(col("p_len"))).as("n_fail_len"),
        (count(lit(1)) - sum(col("p_wl"))).as("n_fail_wordlen"),
        (count(lit(1)) - sum(col("p_stop"))).as("n_fail_stop"),
        (count(lit(1)) - sum(col("p_rep"))).as("n_fail_rep"),
        (count(lit(1)) - sum(col("p_ttr"))).as("n_fail_ttr"))
  }

  val q142GopherRulesSql: String =
    """WITH s AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |    n_chars - CAST(len(string_split(text, ' ')) AS BIGINT) + 1 AS tokchars
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, MAX(c) AS top_freq FROM (
      |    SELECT doc_id, tok, COUNT(*) AS c FROM (
      |      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |flags AS (
      |  SELECT source,
      |    CASE WHEN n_tok >= 20 AND n_tok <= 1000 THEN 1 ELSE 0 END AS p_len,
      |    CASE WHEN n_tok * 3 <= tokchars AND tokchars <= n_tok * 5
      |      THEN 1 ELSE 0 END AS p_wl,
      |    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS p_stop,
      |    CASE WHEN top_freq * 8 <= n_tok THEN 1 ELSE 0 END AS p_rep,
      |    CASE WHEN n_distinct * 10 >= n_tok * 3 THEN 1 ELSE 0 END AS p_ttr
      |  FROM s JOIN tf USING (doc_id))
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(p_len * p_wl * p_stop * p_rep * p_ttr) AS BIGINT) AS n_pass,
      |  COUNT(*) - CAST(SUM(p_len) AS BIGINT) AS n_fail_len,
      |  COUNT(*) - CAST(SUM(p_wl) AS BIGINT) AS n_fail_wordlen,
      |  COUNT(*) - CAST(SUM(p_stop) AS BIGINT) AS n_fail_stop,
      |  COUNT(*) - CAST(SUM(p_rep) AS BIGINT) AS n_fail_rep,
      |  COUNT(*) - CAST(SUM(p_ttr) AS BIGINT) AS n_fail_ttr
      |FROM flags GROUP BY source""".stripMargin

  /** q144: interpolated-bigram LM scoring of a held-out split (docs with
    * `doc_id % 10 ≥ 8`) against a model trained on the rest — the CCNet
    * perplexity filter one Markov order up from q78's unigram
    * ([[graft.ops.LangModel.scoreBitsPerBigram]] for the smoothing and
    * the scale shape). The deterministic modulo split keeps both engines
    * on the identical train corpus without any hash-function contract. */
  def q144BigramLm(spark: SparkSession, dir: String): DataFrame = {
    // single-row-group corpus → one scan task; the bigram explode is the
    // per-row kernel that needs the cores (spread = identity at scale)
    val d = Tables.spread(Tables.documents(spark, dir))
    val (bi, counts, totals) =
      graft.ops.LangModel.bigramModel(d.filter(col("doc_id") % 10 < 8), "text")
    graft.ops.LangModel.scoreBitsPerBigram(
      d.filter(col("doc_id") % 10 >= 8), bi, counts, totals, "doc_id", "text")
  }

  val q144BigramLmSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM (
      |    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
      |    FROM toks WHERE len(t) >= 2)),
      |train_bg AS (
      |  SELECT w1, w2, COUNT(*) AS c12 FROM bg
      |  WHERE doc_id % 10 < 8 GROUP BY 1, 2),
      |train_tok AS (
      |  SELECT tok AS term, COUNT(*) AS ct FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      |    WHERE doc_id % 10 < 8)
      |  WHERE tok <> '' GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(ct) AS BIGINT) AS n_train, COUNT(*) AS v_train
      |  FROM train_tok),
      |costs AS (
      |  SELECT b.doc_id,
      |    CAST(round(-log2(
      |      (CASE WHEN c1.ct IS NULL THEN 0.0
      |        ELSE 0.9 * (CAST(COALESCE(tb.c12, 0) AS DOUBLE) / c1.ct) END)
      |      + 0.1 * (CAST(COALESCE(cu.ct, 0) + 1 AS DOUBLE)
      |               / (t.n_train + t.v_train + 1))
      |    ) * 1000000.0) AS BIGINT) AS c
      |  FROM bg b
      |  LEFT JOIN train_bg tb ON tb.w1 = b.w1 AND tb.w2 = b.w2
      |  LEFT JOIN train_tok c1 ON c1.term = b.w1
      |  LEFT JOIN train_tok cu ON cu.term = b.w2
      |  CROSS JOIN tot t
      |  WHERE b.doc_id % 10 >= 8)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(round(CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS BIGINT) AS bits_fp6
      |FROM costs GROUP BY doc_id""".stripMargin

  /** Shared by q242/q243: q144's interpolated-bigram model (trained on
    * doc_id % 10 < 8) scoring EVERY document with ≥2 tokens — the
    * model-based quality signal the CCNet/DoReMi-style curation gates
    * consume. */
  private[queries] def bigramBitsAll(spark: SparkSession, dir: String)
      : DataFrame = {
    val d = Tables.spread(Tables.documents(spark, dir))
    val (bi, counts, totals) = graft.ops.LangModel.bigramModel(
      d.filter(col("doc_id") % 10 < 8), "text")
    graft.ops.LangModel.scoreBitsPerBigram(d, bi, counts, totals,
      "doc_id", "text")
  }

  /** CTE chain mirroring [[bigramBitsAll]]: `bits(doc_id, bits_fp6)`.
    * Identical arithmetic to the q144 oracle, minus its eval-split
    * filter. */
  private[queries] val bigramBitsAllSql: String =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM (
      |    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
      |    FROM toks WHERE len(t) >= 2)),
      |train_bg AS (
      |  SELECT w1, w2, COUNT(*) AS c12 FROM bg
      |  WHERE doc_id % 10 < 8 GROUP BY 1, 2),
      |train_tok AS (
      |  SELECT tok AS term, COUNT(*) AS ct FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      |    WHERE doc_id % 10 < 8)
      |  WHERE tok <> '' GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(ct) AS BIGINT) AS n_train, COUNT(*) AS v_train
      |  FROM train_tok),
      |costs AS (
      |  SELECT b.doc_id,
      |    CAST(round(-log2(
      |      (CASE WHEN c1.ct IS NULL THEN 0.0
      |        ELSE 0.9 * (CAST(COALESCE(tb.c12, 0) AS DOUBLE) / c1.ct) END)
      |      + 0.1 * (CAST(COALESCE(cu.ct, 0) + 1 AS DOUBLE)
      |               / (t.n_train + t.v_train + 1))
      |    ) * 1000000.0) AS BIGINT) AS c
      |  FROM bg b
      |  LEFT JOIN train_bg tb ON tb.w1 = b.w1 AND tb.w2 = b.w2
      |  LEFT JOIN train_tok c1 ON c1.term = b.w1
      |  LEFT JOIN train_tok cu ON cu.term = b.w2
      |  CROSS JOIN tot t),
      |bits AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST(round(CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS BIGINT)
      |      AS bits_fp6
      |  FROM costs GROUP BY doc_id)""".stripMargin

  /** q242: CCNet-style head/middle/tail quality buckets (Wenzek et al.
    * 2020): every document scored by the held-out-trained bigram LM,
    * then cut at the PER-LANGUAGE score terciles — head = the best
    * (lowest-bits) third, the slice CCNet keeps by default. The tercile
    * boundaries are exact order statistics computed by
    * [[graft.ops.ShardedOrder.shardedValueAtRank]] (only the bucket
    * holding each target rank is windowed — no per-language corpus
    * sort); the plain-rank oracle certifies the sharded cut as a
    * semantic identity.
    */
  def q242CcnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val bits = bigramBitsAll(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        "doc_id")
      .select(col("lang"), col("doc_id"), col("bits_fp6"))
      .localCheckpoint() // scored corpus feeds two rank cuts + the agg
    def cut(rankOf: Column => Column, out: String) =
      graft.ops.ShardedOrder.shardedValueAtRank(bits, Seq("lang"),
        "bits_fp6", Nil, rankOf, outCol = out)
    val t1 = cut(n => ((n + lit(2L)) / lit(3L)).cast("long"), "t1")
    val t2 = cut(n => ((lit(2L) * n + lit(2L)) / lit(3L)).cast("long"), "t2")
    val bucket = when(col("bits_fp6") <= col("t1"), "head")
      .when(col("bits_fp6") <= col("t2"), "middle")
      .otherwise("tail")
    bits.join(broadcast(t1), Seq("lang")).join(broadcast(t2), Seq("lang"))
      .select(col("lang"), bucket.as("bucket"), col("bits_fp6"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("bits_fp6")).cast("double") /
          count(lit(1)).cast("double")).cast("long").as("mean_bits_fp6"))
  }

  val q242CcnetBucketsSql: String =
    s"""WITH $bigramBitsAllSql,
      |scored AS MATERIALIZED (
      |  SELECT d.lang, b.doc_id, b.bits_fp6
      |  FROM bits b JOIN documents d ON b.doc_id = d.doc_id),
      |rk AS (
      |  SELECT lang, bits_fp6,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bits_fp6) AS r,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM scored),
      |t AS (
      |  SELECT lang,
      |    MAX(CASE WHEN r = (n + 2) // 3 THEN bits_fp6 END) AS t1,
      |    MAX(CASE WHEN r = (2 * n + 2) // 3 THEN bits_fp6 END) AS t2
      |  FROM rk GROUP BY 1)
      |SELECT s.lang,
      |  CASE WHEN s.bits_fp6 <= t.t1 THEN 'head'
      |       WHEN s.bits_fp6 <= t.t2 THEN 'middle'
      |       ELSE 'tail' END AS bucket,
      |  COUNT(*) AS n_docs,
      |  CAST(round(CAST(SUM(s.bits_fp6) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mean_bits_fp6
      |FROM scored s JOIN t ON s.lang = t.lang
      |GROUP BY 1, 2""".stripMargin

  /** q147: mutual information between `lang` and `source` (plus both
    * marginal entropies) — the metadata-association audit: MI ≈ 0 means
    * language is balanced across sources (stratified sampling on either
    * is safe); MI near min(H) means one predicts the other and per-source
    * language filters are redundant. Exact counts → cell-sized tables →
    * per-term fp9 longs summed (order-free); the corpus is touched by
    * exactly one (lang, source) aggregate, everything after is
    * grid-sized. */
  def q147MutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // margins as WINDOW sums over the grid-sized cell table — one linear
    // plan, so the corpus is scanned exactly once (the branch-per-margin
    // form re-derived the aggregate per branch); entropies decompose into
    // per-CELL terms (−(c/n)·ln(cl/n) summed over a language's cells is
    // exactly −(cl/n)·ln(cl/n)), so one final aggregate emits everything
    val cells = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
    val t = cells.select(col("c"),
      sum(col("c")).over(Window.partitionBy(col("lang"))).as("cl"),
      sum(col("c")).over(Window.partitionBy(col("source"))).as("cs"),
      sum(col("c")).over(Window.partitionBy()).as("n"),
      count(lit(1)).over(Window.partitionBy()).as("n_cells"))
    def fp9(x: Column): Column = round(x * lit(1e9)).cast("long")
    t.agg(
      max(col("n")).as("n_docs"),
      max(col("n_cells")).as("n_cells"),
      sum(fp9(col("c").cast("double") / col("n") *
        log(col("c").cast("double") * col("n") /
          (col("cl").cast("double") * col("cs"))))).as("mi_fp9"),
      sum(fp9(-(col("c").cast("double") / col("n")) *
        log(col("cl").cast("double") / col("n")))).as("h_lang_fp9"),
      sum(fp9(-(col("c").cast("double") / col("n")) *
        log(col("cs").cast("double") / col("n")))).as("h_source_fp9"))
  }

  val q147MutualInfoSql: String =
    """WITH cells AS (
      |  SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2),
      |t AS (
      |  SELECT c,
      |    SUM(c) OVER (PARTITION BY lang) AS cl,
      |    SUM(c) OVER (PARTITION BY source) AS cs,
      |    SUM(c) OVER () AS n,
      |    COUNT(*) OVER () AS n_cells
      |  FROM cells)
      |SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
      |  CAST(MAX(n_cells) AS BIGINT) AS n_cells,
      |  CAST(SUM(CAST(round(CAST(c AS DOUBLE) / n
      |    * ln(CAST(c AS DOUBLE) * n / (CAST(cl AS DOUBLE) * cs))
      |    * 1000000000.0) AS BIGINT)) AS BIGINT) AS mi_fp9,
      |  CAST(SUM(CAST(round(-(CAST(c AS DOUBLE) / n)
      |    * ln(CAST(cl AS DOUBLE) / n) * 1000000000.0) AS BIGINT)) AS BIGINT)
      |    AS h_lang_fp9,
      |  CAST(SUM(CAST(round(-(CAST(c AS DOUBLE) / n)
      |    * ln(CAST(cs AS DOUBLE) / n) * 1000000000.0) AS BIGINT)) AS BIGINT)
      |    AS h_source_fp9
      |FROM t""".stripMargin

  /** q154: source-balance Lorenz table — token mass per source, ranked,
    * with cumulative share: the concentration audit behind temperature
    * mixing (q94) and source caps (q83). "Top 2 sources hold 60% of
    * tokens" is read directly off `cum_share_fp6`. One corpus aggregate;
    * the ranking window runs on the source-cardinality table. */
  def q154SourceBalance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val wRank = Window.orderBy(col("n_tokens").desc, col("source"))
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    s.select(
      row_number().over(wRank).cast("long").as("rank"),
      col("source"), col("n_docs"), col("n_tokens"),
      round(col("n_tokens").cast("double") * lit(1e6) /
        sum(col("n_tokens")).over(wAll)).cast("long").as("share_fp6"),
      round(sum(col("n_tokens")).over(wCum).cast("double") * lit(1e6) /
        sum(col("n_tokens")).over(wAll)).cast("long").as("cum_share_fp6"))
  }

  val q154SourceBalanceSql: String =
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1)
      |SELECT
      |  CAST(row_number() OVER (ORDER BY n_tokens DESC, source) AS BIGINT)
      |    AS rank,
      |  source, n_docs, n_tokens,
      |  CAST(round(CAST(n_tokens AS DOUBLE) * 1000000.0
      |    / SUM(n_tokens) OVER ()) AS BIGINT) AS share_fp6,
      |  CAST(round(CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    * 1000000.0 / SUM(n_tokens) OVER ()) AS BIGINT) AS cum_share_fp6
      |FROM s""".stripMargin

  /** q157: token-exclusivity audit — per source: total token mass,
    * distinct vocabulary, and how much of that vocabulary appears in NO
    * other source. High exclusivity = the source contributes genuinely
    * novel text (cutting it shrinks the effective dataset); near-zero =
    * it re-treads the shared vocabulary (a dedup/cap candidate). Two
    * linear aggregates: the token stream folds to (source, term) counts
    * once; the term-spread table is vocabulary-sized. */
  def q157TokenExclusivity(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
    val spread = st.groupBy(col("term")).agg(count(lit(1)).as("n_sources"))
    st.join(spread, "term")
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L)).as("n_exclusive"))
  }

  val q157TokenExclusivitySql: String =
    """WITH st AS (
      |  SELECT source, term, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS term
      |    FROM documents)
      |  WHERE term <> '' GROUP BY 1, 2),
      |spread AS (SELECT term, COUNT(*) AS n_sources FROM st GROUP BY 1)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_distinct,
      |  CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_exclusive
      |FROM st JOIN spread USING (term)
      |GROUP BY source""".stripMargin

  /** q150: single-pass data-quality report (the Deequ/Great-Expectations
    * shape, via [[graft.ops.Validate.violations]]): range, ordering,
    * null, format, and referential-integrity expectations all counted in
    * ONE scan of the fact table — the RI check rides the same pass as a
    * left join instead of a second anti-join scan. One row out; every
    * column is a violation count a pipeline can alert on. */
  def q150DqReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Validate
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), lit(1L).as("_ok"))
    val joined = li.join(ord, Seq("l_orderkey"), "left")
    Validate.violations(joined, Seq(
      Validate.Rule("discount_le_8pct", col("l_discount") <= 0.08),
      Validate.Rule("quantity_le_45", col("l_quantity") <= 45),
      Validate.inRange("l_tax", 0.0, 0.06),
      Validate.notNull("l_shipdate"),
      Validate.matches("l_returnflag", "^[ANR]$"),
      Validate.Rule("price_positive", col("l_extendedprice") > 0),
      Validate.Rule("orderkey_resolves", col("_ok").isNotNull)))
  }

  val q150DqReportSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN NOT COALESCE(l_discount <= 0.08, FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS discount_le_8pct,
      |  CAST(SUM(CASE WHEN NOT COALESCE(l_quantity <= 45, FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS quantity_le_45,
      |  CAST(SUM(CASE WHEN NOT COALESCE(l_tax BETWEEN 0.0 AND 0.06, FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS l_tax_in_range,
      |  CAST(SUM(CASE WHEN l_shipdate IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS l_shipdate_not_null,
      |  CAST(SUM(CASE WHEN NOT COALESCE(
      |      regexp_matches(l_returnflag, '^[ANR]$'), FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS l_returnflag_format,
      |  CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS price_positive,
      |  CAST(SUM(CASE WHEN o.o_orderkey IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS orderkey_resolves
      |FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey""".stripMargin

  /** Benford expectation log10(1 + 1/d) at fixed 1e−6 precision — a
    * LITERAL grid on both engines (never recomputed from `log`, whose
    * last-ulp could differ across libm builds). The nine values sum to
    * exactly 1,000,000. */
  private val benfordFp6: Seq[(Long, Long)] = Seq(
    1L -> 301030L, 2L -> 176091L, 3L -> 124939L, 4L -> 96910L,
    5L -> 79181L, 6L -> 66947L, 7L -> 57992L, 8L -> 51153L, 9L -> 45757L)

  /** q173: Benford first-digit audit of order amounts — the classic
    * fabricated-numbers / unit-mixup detector run on financial columns
    * before they feed revenue reporting: the observed first-significant-
    * digit distribution against Benford's law, with the deviation per
    * digit. The digit comes from the exact-cents INTEGER's decimal string
    * (never float log10, whose boundary cells would be engine-dependent);
    * the digit grid drives a LEFT join so all nine rows exist even when a
    * digit never occurs (the q163 empty-group discipline). One scan, one
    * 9-group aggregate — nothing here grows with data. */
  def q173Benford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = Tables.orders(spark, dir)
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    val tot = Tables.orders(spark, dir).agg(count(lit(1)).as("t"))
    val grid = benfordFp6.toDF("digit", "benford_fp6")
    val share = round(lit(1e6) * coalesce(col("n_orders"), lit(0L)) / col("t"))
      .cast("long")
    broadcast(grid).join(digits, Seq("digit"), "left").crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        share.as("share_fp6"), col("benford_fp6"),
        abs(share - col("benford_fp6")).as("dev_fp6"))
  }

  val q173BenfordSql: String = {
    val gridRows = benfordFp6.map { case (d, b) => s"($d, $b)" }.mkString(", ")
    s"""WITH c AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders),
      |n AS (SELECT digit, COUNT(*) AS n_orders FROM c GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS t FROM orders),
      |grid(digit, benford_fp6) AS (VALUES $gridRows)
      |SELECT CAST(g.digit AS BIGINT) AS digit,
      |  CAST(COALESCE(n.n_orders, 0) AS BIGINT) AS n_orders,
      |  CAST(round(1e6 * COALESCE(n.n_orders, 0) / t) AS BIGINT) AS share_fp6,
      |  CAST(g.benford_fp6 AS BIGINT) AS benford_fp6,
      |  CAST(abs(round(1e6 * COALESCE(n.n_orders, 0) / t) - g.benford_fp6)
      |    AS BIGINT) AS dev_fp6
      |FROM grid g LEFT JOIN n USING (digit) CROSS JOIN tot""".stripMargin
  }

  /** q188: k-anonymity / l-diversity privacy audit (Sweeney 2002;
    * Machanavajjhala et al. 2007) — the release gate a dataset must pass
    * before rows with quasi-identifiers ship in a training corpus. Rows
    * group into equivalence classes on the quasi-identifier pair
    * (nation, ⌊acctbal/1000⌋); per nation the report carries the
    * re-identification floor `k_min` (smallest class), the suppression
    * load `rows_below_k5` (rows that would be dropped under k ≥ 5), and
    * the attribute-disclosure signal from the sensitive column
    * (mktsegment): `l_min` and the count of l=1 classes, where EVERY
    * member's segment is exposed by membership alone.
    *
    * Scale shape: one class-keyed aggregate (exact distinct over a
    * 5-value sensitive domain is map-side cheap) folding into a
    * nation-sized rollup — two shuffles, the second over ≤ classes rows.
    * The bucket edge is `floor` on an IEEE division both engines share;
    * every output is an exact integer. */
  def q188KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nation"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"),
        col("c_mktsegment").as("seg"))
      .groupBy(col("nation"), col("bal_bucket"))
      .agg(count(lit(1)).as("k"), countDistinct(col("seg")).as("l"))
    classes.groupBy(col("nation"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("k")).as("n_rows"),
        min(col("k")).as("k_min"),
        sum(when(col("k") < 5, col("k")).otherwise(lit(0L))).as("rows_below_k5"),
        min(col("l")).as("l_min"),
        sum(when(col("l") === 1, lit(1L)).otherwise(lit(0L))).as("n_classes_l1"))
  }

  val q188KAnonymitySql: String =
    """WITH cls AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
      |    COUNT(*) AS k, COUNT(DISTINCT c_mktsegment) AS l
      |  FROM customer GROUP BY 1, 2)
      |SELECT nation, COUNT(*) AS n_classes,
      |  CAST(SUM(k) AS BIGINT) AS n_rows, CAST(MIN(k) AS BIGINT) AS k_min,
      |  CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |    AS rows_below_k5,
      |  CAST(MIN(l) AS BIGINT) AS l_min,
      |  CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_classes_l1
      |FROM cls GROUP BY nation""".stripMargin

  /** q195: Gini concentration of training mass across sources — the
    * Lorenz-curve number a dataset card reports ("is 90% of the corpus
    * two domains?"), from the sorted-index identity
    * `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` over sources ranked by
    * ascending char mass (ties broken by source name for a total
    * order). Every sum is an exact integer; one IEEE expression at the
    * end.
    *
    * Scale shape: the corpus collapses to ONE source-sized aggregate
    * first (map-side combined); the rank window and the Gini fold run
    * over ~tens of rows, so the unpartitioned window is trivially
    * safe — the corpus never meets a global sort. */
  def q195GiniSources(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("x"))
    val ranked = src.select(col("x"),
      row_number().over(Window.orderBy(col("x"), col("source"))).as("i"))
    ranked
      .agg(count(lit(1)).as("n_sources"), sum(col("x")).as("total_chars"),
        sum(col("i").cast("long") * col("x")).as("six"))
      .select(col("n_sources"), col("total_chars"),
        round(lit(1e6) *
          (lit(2.0) * col("six").cast("double")
            - (col("n_sources") + 1).cast("double") * col("total_chars").cast("double"))
          / (col("n_sources").cast("double") * col("total_chars").cast("double")))
          .cast("long").as("gini_fp6"))
  }

  val q195GiniSourcesSql: String =
    """WITH src AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS x
      |  FROM documents GROUP BY 1),
      |ranked AS (
      |  SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM src),
      |a AS (
      |  SELECT COUNT(*) AS n_sources, CAST(SUM(x) AS BIGINT) AS total_chars,
      |    CAST(SUM(i * x) AS BIGINT) AS six
      |  FROM ranked)
      |SELECT n_sources, total_chars,
      |  CAST(round(1e6 * (2.0 * CAST(six AS DOUBLE)
      |      - CAST(n_sources + 1 AS DOUBLE) * CAST(total_chars AS DOUBLE))
      |    / (CAST(n_sources AS DOUBLE) * CAST(total_chars AS DOUBLE)))
      |    AS BIGINT) AS gini_fp6
      |FROM a""".stripMargin

  /** q198: Cohen's κ inter-rater agreement (Cohen 1960) between two
    * independent quality annotators over the corpus — here the
    * 4-component quality score (gate at ≥ 0.75, i.e. 3-of-4 checks)
    * versus a pared Gopher rule (length band + TTR floor). κ corrects
    * raw agreement for chance, which is exactly what a curation team
    * needs before replacing an expensive filter with a cheap one that
    * "agrees 90% of the time" (so would two raters flipping biased
    * coins). Fully exact: the 2×2 cell counts are integers and
    * `κ = (N·(n₁₁+n₀₀) − pe_num) / (N² − pe_num)` with
    * `pe_num = pa·pb + (N−pa)·(N−pb)` is one integer-over-integer
    * division rounded once to fp6. (N² must fit the accumulator:
    * BIGINT to ~3·10⁹ rows; swap to Decimal/HUGEINT cells beyond.)
    *
    * Scale shape: both annotators are zero-shuffle codegen'd
    * projections; the whole corpus folds into FOUR counters (map-side
    * combined) — constant shuffle bytes at any scale. */
  def q198CohenKappa(spark: SparkSession, dir: String): DataFrame = {
    val en = graft.ops.TextOps.langProfiles.head._2
    val toks = split(col("text"), " ")
    val d = Tables.documents(spark, dir).select(
      (graft.ops.TextOps.qualityScore(col("text"), en) >= 0.75).as("a1"),
      (size(toks).cast("long").between(20L, 1000L) &&
        size(array_distinct(toks)).cast("long") * 10 >=
          size(toks).cast("long") * 3).as("a2"))
    val cells = d.agg(
      sum(when(col("a1") && col("a2"), lit(1L)).otherwise(lit(0L))).as("n11"),
      sum(when(col("a1") && !col("a2"), lit(1L)).otherwise(lit(0L))).as("n10"),
      sum(when(!col("a1") && col("a2"), lit(1L)).otherwise(lit(0L))).as("n01"),
      sum(when(!col("a1") && !col("a2"), lit(1L)).otherwise(lit(0L))).as("n00"))
    val nt = col("n11") + col("n10") + col("n01") + col("n00")
    val pa = col("n11") + col("n10")
    val pb = col("n11") + col("n01")
    val peNum = pa * pb + (nt - pa) * (nt - pb)
    cells.select(col("n11"), col("n10"), col("n01"), col("n00"),
      round(lit(1e6) *
        (nt * (col("n11") + col("n00")) - peNum).cast("double") /
        (nt * nt - peNum).cast("double")).cast("long").as("kappa_fp6"))
  }

  val q198CohenKappaSql: String =
    s"""WITH t AS (
      |  SELECT text, string_split(text, ' ') AS toks FROM documents),
      |ann AS (
      |  SELECT (${OracleFragments.qualityExpr} >= 0.75) AS a1,
      |    (len(toks) BETWEEN 20 AND 1000 AND
      |     CAST(len(list_distinct(toks)) AS BIGINT) * 10 >=
      |       CAST(len(toks) AS BIGINT) * 3) AS a2
      |  FROM t),
      |c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN a1 AND a2 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |    CAST(SUM(CASE WHEN a1 AND NOT a2 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
      |    CAST(SUM(CASE WHEN NOT a1 AND a2 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
      |    CAST(SUM(CASE WHEN NOT a1 AND NOT a2 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      |  FROM ann),
      |k AS (
      |  SELECT n11, n10, n01, n00,
      |    n11 + n10 + n01 + n00 AS nt,
      |    n11 + n10 AS pa, n11 + n01 AS pb
      |  FROM c),
      |k2 AS (
      |  SELECT *, pa * pb + (nt - pa) * (nt - pb) AS pe_num FROM k)
      |SELECT n11, n10, n01, n00,
      |  CAST(round(1e6 * CAST(nt * (n11 + n00) - pe_num AS DOUBLE)
      |    / CAST(nt * nt - pe_num AS DOUBLE)) AS BIGINT) AS kappa_fp6
      |FROM k2""".stripMargin

  /** q200: differentially-private count release (Dwork et al. 2006) —
    * per-event-type counts with Laplace(1/ε) noise at ε = 1,
    * sensitivity 1: the mechanism a privacy team applies before stats
    * on user activity leave the boundary, paired with q188's
    * k-anonymity audit on the other side of the release pipeline. The
    * noise is drawn by inverse-CDF from the md5 uniform
    * (`X = −sign(u)·ln(1−2|u|)`, u ∈ (−½,½)), so the mechanism is
    * REPLAYABLE — the oracle re-derives the identical draw, which is
    * exactly how a DP release is audited for correct calibration
    * without trusting the implementation. (A production release would
    * swap the seed for a secret one; the mechanism is unchanged.) The
    * `(h+1)/(2⁵²+1)` map keeps u away from the ln(0) pole exactly.
    *
    * Scale shape: one type-sized aggregate; the noise is a per-group
    * projection. */
  def q200DpRelease(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.ops.TrainingMix.hex13(concat(col("event_type"), lit("#dp")))
    val u0 = (h + 1).cast("double") / lit(4503599627370497.0) - 0.5
    val noise = -signum(u0) * log(lit(1.0) - lit(2.0) * abs(u0))
    Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        round(lit(1e6) * (col("n") + noise)).cast("long").as("noisy_fp6"),
        round(lit(1e6) * abs(noise)).cast("long").as("abs_noise_fp6"))
  }

  val q200DpReleaseSql: String = {
    val u0 = s"((${OracleFragments.hex13Sql("event_type || '#dp'")} + 1)" +
      " / 4503599627370497.0 - 0.5)"
    s"""WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
      |nz AS (
      |  SELECT event_type, n,
      |    -sign($u0) * ln(1.0 - 2.0 * abs($u0)) AS noise
      |  FROM c)
      |SELECT event_type, n,
      |  CAST(round(1e6 * (n + noise)) AS BIGINT) AS noisy_fp6,
      |  CAST(round(1e6 * abs(noise)) AS BIGINT) AS abs_noise_fp6
      |FROM nz""".stripMargin
  }

  /** q228: Theil-T inequality decomposition of character mass across
    * documents — total T = (1/N)·Σ (x/μ)·ln(x/μ), split into the
    * BETWEEN-source component (how unequal the source means are) and
    * the WITHIN-source component (Σ_s (S_s/S)·T_s, inequality inside
    * each source) — the additive decomposition Gini (q195) lacks, which
    * is why dataset cards report both. Per-document terms are fp9-rounded
    * before Decimal(38,0) sums (order-free, overflow-safe at any SF);
    * the handful of per-source finishing ops run in double from exact
    * integers with mirrored expression trees.
    *
    * Scale: one corpus pass computes both per-doc term families after a
    * broadcast of the source-stats grid and the global scalar; every
    * later step is sources-sized. No sort, no window over the corpus.
    */
  def q228Theil(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("source"), col("n_chars").as("x"))
    val glob = docs.agg(count(lit(1)).as("nn"), sum(col("x")).as("ss"))
    val bySrc = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_s"), sum(col("x")).as("s_s"))
    val joined = docs
      .join(broadcast(bySrc), Seq("source"))
      .crossJoin(broadcast(glob))
    // r = x/μ = x·N/S; u = x/μ_s = x·N_s/S_s — ratios of exact integers
    val r = col("x").cast("double") * col("nn").cast("double") /
      col("ss").cast("double")
    val u = col("x").cast("double") * col("n_s").cast("double") /
      col("s_s").cast("double")
    def t9(e: Column) = sum(round(e * log(e) * lit(1e9))
      .cast(DecimalType(38, 0)))
    val perSrc = joined.groupBy(col("source"), col("n_s"), col("s_s"),
        col("nn"), col("ss"))
      .agg(t9(r).as("tot9"), t9(u).as("win9"))
    // per-source finish: between term (N_s/N)·r_s·ln(r_s) and the
    // S_s/S-weighted within term, each fp9-rounded then integer-summed
    val rs = col("s_s").cast("double") * col("nn").cast("double") /
      (col("n_s").cast("double") * col("ss").cast("double"))
    val btw9 = round(col("n_s").cast("double") / col("nn").cast("double") *
      rs * log(rs) * lit(1e9)).cast("long")
    val win9 = round(col("s_s").cast("double") / col("ss").cast("double") *
      (col("win9").cast("double") / col("n_s").cast("double"))).cast("long")
    perSrc
      .select(col("nn"), col("ss"), col("tot9"), btw9.as("b9"), win9.as("w9"))
      .groupBy(col("nn"))
      .agg(max(col("ss")).as("ss"), count(lit(1)).as("n_sources"),
        sum(col("tot9")).as("tot9"), sum(col("b9")).as("b9"),
        sum(col("w9")).as("w9"))
      .select(col("nn").as("n_docs"), col("n_sources"),
        round(col("tot9").cast("double") / col("nn").cast("double"))
          .cast("long").as("t_fp9"),
        col("b9").as("between_fp9"), col("w9").as("within_fp9"))
  }

  val q228TheilSql: String =
    """WITH d AS (
      |  SELECT source, n_chars AS x FROM documents WHERE n_chars > 0),
      |g AS (SELECT COUNT(*) AS nn, CAST(SUM(x) AS BIGINT) AS ss FROM d),
      |bs AS (
      |  SELECT source, COUNT(*) AS n_s, CAST(SUM(x) AS BIGINT) AS s_s
      |  FROM d GROUP BY 1),
      |terms AS (
      |  SELECT d.source, bs.n_s, bs.s_s, g.nn, g.ss,
      |    CAST(SUM(CAST(round(
      |      (CAST(d.x AS DOUBLE) * CAST(g.nn AS DOUBLE)
      |        / CAST(g.ss AS DOUBLE))
      |      * ln(CAST(d.x AS DOUBLE) * CAST(g.nn AS DOUBLE)
      |        / CAST(g.ss AS DOUBLE)) * 1e9) AS BIGINT)) AS HUGEINT) AS tot9,
      |    CAST(SUM(CAST(round(
      |      (CAST(d.x AS DOUBLE) * CAST(bs.n_s AS DOUBLE)
      |        / CAST(bs.s_s AS DOUBLE))
      |      * ln(CAST(d.x AS DOUBLE) * CAST(bs.n_s AS DOUBLE)
      |        / CAST(bs.s_s AS DOUBLE)) * 1e9) AS BIGINT)) AS HUGEINT) AS win9
      |  FROM d JOIN bs ON d.source = bs.source, g
      |  GROUP BY 1, 2, 3, 4, 5),
      |fin AS (
      |  SELECT nn, ss, tot9,
      |    CAST(round(CAST(n_s AS DOUBLE) / CAST(nn AS DOUBLE)
      |      * (CAST(s_s AS DOUBLE) * CAST(nn AS DOUBLE)
      |        / (CAST(n_s AS DOUBLE) * CAST(ss AS DOUBLE)))
      |      * ln(CAST(s_s AS DOUBLE) * CAST(nn AS DOUBLE)
      |        / (CAST(n_s AS DOUBLE) * CAST(ss AS DOUBLE))) * 1e9)
      |      AS BIGINT) AS b9,
      |    CAST(round(CAST(s_s AS DOUBLE) / CAST(ss AS DOUBLE)
      |      * (CAST(win9 AS DOUBLE) / CAST(n_s AS DOUBLE))) AS BIGINT) AS w9
      |  FROM terms)
      |SELECT nn AS n_docs, COUNT(*) AS n_sources,
      |  CAST(round(CAST(SUM(tot9) AS DOUBLE) / CAST(nn AS DOUBLE))
      |    AS BIGINT) AS t_fp9,
      |  CAST(SUM(b9) AS BIGINT) AS between_fp9,
      |  CAST(SUM(w9) AS BIGINT) AS within_fp9
      |FROM fin GROUP BY nn""".stripMargin

  /** q233: Hill estimator of the document-length tail index over the
    * k = 200 largest documents: ĥ = (1/(k−1))·Σ_{i<k} (ln x₍ᵢ₎ − ln x₍ₖ₎),
    * α̂ = 1/ĥ — the standard power-law tail diagnostic (heavier tail ⇒
    * larger ĥ ⇒ smaller α̂), the number that decides whether length caps /
    * packing budgets are sized for a Pareto or an exponential corpus.
    * Each ln is fp9-quantized per order statistic before the exact
    * integer sum, and the boundary x₍ₖ₎ is subtracted arithmetically
    * (k·ln x₍ₖ₎), so both engines agree bit-for-bit.
    *
    * Scale: top-k selection plans as TakeOrderedAndProject (per-partition
    * heaps); everything after is a 200-row aggregate. No global sort.
    */
  def q233Hill(spark: SparkSession, dir: String): DataFrame = {
    val k = 200
    val top = Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(k)
      .select(round(log(col("n_chars").cast("double")) * lit(1e9))
        .cast("long").as("l9"), col("n_chars"), col("doc_id"))
    // x_(k) = the minimum of the selected top-k (ties broken by doc_id in
    // the SELECTION only; the ln value of the boundary is order-free)
    val agg = top.agg(count(lit(1)).as("k"), sum(col("l9")).as("sl9"),
      min(col("l9")).as("lk9"))
    agg.select(col("k"),
        ((col("sl9") - col("k") * col("lk9")).cast("double") /
          (col("k") - 1).cast("double") / lit(1e9)).as("h"))
      .select(col("k").as("k_top"),
        round(col("h") * lit(1e6)).cast("long").as("hill_fp6"),
        round(lit(1e6) / col("h")).cast("long").as("alpha_fp6"))
  }

  val q233HillSql: String =
    """WITH top AS (
      |  SELECT CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1e9) AS BIGINT)
      |    AS l9
      |  FROM documents WHERE n_chars > 0
      |  ORDER BY n_chars DESC, doc_id LIMIT 200),
      |a AS (
      |  SELECT COUNT(*) AS k, CAST(SUM(l9) AS BIGINT) AS sl9,
      |    MIN(l9) AS lk9
      |  FROM top),
      |h AS (
      |  SELECT k, CAST(sl9 - k * lk9 AS DOUBLE)
      |    / CAST(k - 1 AS DOUBLE) / 1e9 AS h
      |  FROM a)
      |SELECT k AS k_top,
      |  CAST(round(h * 1e6) AS BIGINT) AS hill_fp6,
      |  CAST(round(1e6 / h) AS BIGINT) AS alpha_fp6
      |FROM h""".stripMargin
}
