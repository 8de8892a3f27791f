package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TrainingMix

/** Training-mix gate queries over `documents`: deterministic stratified
  * sampling, sequence packing, benchmark contamination. Every oracle
  * replays the md5-derived randomness exactly (same first-8-hex-chars
  * uniform used by the MinHash/LSH gates).
  */
object MixQueries {

  import OracleFragments.{hex8Sql, hex13Sql}

  private val langRates = Map("en" -> 0.5, "es" -> 0.25, "zh" -> 0.75)
  private val defaultRate = 0.1

  /** Deterministic language-stratified sample of the corpus. */
  def q51StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    TrainingMix.stratifiedSample(Tables.documents(spark, dir),
        "doc_id", "lang", langRates, defaultRate)
      .select(col("doc_id"), col("lang"))

  val q51StratifiedSampleSql: String = {
    val thr = (r: Double) => (r * 4294967296.0).toLong
    val cases = langRates.map { case (l, r) => s"WHEN '$l' THEN ${thr(r)}" }.mkString(" ")
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${hex8Sql("doc_id::VARCHAR || '#smp'")} <
       |  CASE lang $cases ELSE ${thr(defaultRate)} END""".stripMargin
  }

  /** Greedy sharded sequence packing at a 1024-token budget. */
  def q52PackSequences(spark: SparkSession, dir: String): DataFrame =
    TrainingMix.packSequences(Tables.documents(spark, dir),
        "doc_id", "text", budgetTokens = 1024L, shards = 8)
      .withColumnRenamed("id", "doc_id")

  val q52PackSequencesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |    ${hex8Sql("doc_id::VARCHAR || '#shard'")} % 8 AS shard
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, tokens, shard,
       |    CAST(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t)
       |SELECT doc_id, tokens, shard,
       |  (cum - tokens) // 1024 AS seq, cum - tokens AS tok_start
       |FROM c""".stripMargin

  /** Benchmark contamination: corpus docs (id ≥ 50) sharing ≥1 distinct
    * 5-gram with the benchmark slice (id < 50), with the shared count. */
  def q53Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TrainingMix.contamination(
        docs.filter(col("doc_id") >= 50),
        docs.filter(col("doc_id") < 50),
        "doc_id", "text", n = 5)
      .withColumnRenamed("id", "doc_id")
  }

  val q53ContaminationSql: String =
    """WITH toks AS (
      |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
      |         unnest(string_split(text,' ')) AS tok
      |  FROM documents),
      |led AS (
      |  SELECT doc_id, tok,
      |    lead(tok,1) OVER w AS l1, lead(tok,2) OVER w AS l2,
      |    lead(tok,3) OVER w AS l3, lead(tok,4) OVER w AS l4
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |sh AS (
      |  SELECT DISTINCT doc_id, tok||' '||l1||' '||l2||' '||l3||' '||l4 AS sh
      |  FROM led WHERE l4 IS NOT NULL),
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 50)
      |SELECT s.doc_id, COUNT(*) AS n_shared
      |FROM sh s JOIN bench USING (sh)
      |WHERE s.doc_id >= 50
      |GROUP BY s.doc_id""".stripMargin

  /** Fuzzy-decontamination gate ([[graft.ops.Dedup.minhashCrossCandidates]]):
    * MinHash near-dup pairs between the corpus slice (id ≥ 50) and the
    * benchmark slice (id < 50) at est_jaccard ≥ 0.5 — the paraphrase-
    * robust tier above q53's exact 5-gram overlap, same corpus/benchmark
    * split so the two tiers are directly comparable. */
  def q89FuzzyDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    graft.ops.Dedup.minhashCrossCandidates(
        docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
        "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
  }

  val q89FuzzyDecontamSql: String =
    s"""WITH ${OracleFragments.minhashSigCtes("documents")}
      |SELECT s1.doc_id AS corpus_id, s2.doc_id AS bench_id,
      |  COUNT(*)/8.0 AS est_jaccard
      |FROM sig s1
      |JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh
      |WHERE s1.doc_id >= 50 AND s2.doc_id < 50
      |GROUP BY 1, 2
      |HAVING COUNT(*)/8.0 >= 0.5""".stripMargin

  /** Tiered contamination REPORT — q53's exact 5-gram tier and q89's
    * fuzzy MinHash tier combined into one per-document verdict over the
    * corpus slice: 'exact' (any shared benchmark 5-gram), else 'fuzzy'
    * (max est-Jaccard vs any benchmark doc ≥ 0.5), else 'clean'. This is
    * the decontamination decision table a training run actually consumes;
    * both tiers reuse their gate-certified constructions, and the fuzzy
    * tier keeps ALL candidate pairs (no threshold) so the report carries
    * the borderline max_est evidence, not just the binary call. */
  def q126ContamReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") >= 50)
    val exact = TrainingMix.contamination(
        corpus, docs.filter(col("doc_id") < 50), "doc_id", "text", n = 5)
      .withColumnRenamed("id", "doc_id")
    val spread = Tables.spread(docs)
    val fuzzy = graft.ops.Dedup.minhashCrossCandidates(
        spread.filter(col("doc_id") >= 50), spread.filter(col("doc_id") < 50),
        "doc_id", "text")
      .groupBy(col("corpus_id").as("doc_id"))
      .agg(max(col("est_jaccard")).as("max_est"))
    corpus.select(col("doc_id"), col("source"))
      .join(exact, Seq("doc_id"), "left")
      .join(fuzzy, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(col("max_est"), lit(0.0)).as("max_est"),
        when(col("n_shared") >= 1, lit("exact"))
          .when(col("max_est") >= 0.5, lit("fuzzy"))
          .otherwise(lit("clean")).as("verdict"))
  }

  val q126ContamReportSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
      |         unnest(string_split(text,' ')) AS tok
      |  FROM documents),
      |led AS (
      |  SELECT doc_id, tok,
      |    lead(tok,1) OVER w AS l1, lead(tok,2) OVER w AS l2,
      |    lead(tok,3) OVER w AS l3, lead(tok,4) OVER w AS l4
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |sh AS (
      |  SELECT DISTINCT doc_id, tok||' '||l1||' '||l2||' '||l3||' '||l4 AS sh
      |  FROM led WHERE l4 IS NOT NULL),
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 50),
      |ex AS (
      |  SELECT s.doc_id, COUNT(*) AS n_shared
      |  FROM sh s JOIN bench USING (sh)
      |  WHERE s.doc_id >= 50
      |  GROUP BY s.doc_id),
      |${OracleFragments.minhashSigCtes("documents", p = "m")},
      |fz AS (
      |  SELECT doc_id, MAX(est) AS max_est FROM (
      |    SELECT s1.doc_id AS doc_id, s2.doc_id AS bid, COUNT(*)/8.0 AS est
      |    FROM msig s1
      |    JOIN msig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh
      |    WHERE s1.doc_id >= 50 AND s2.doc_id < 50
      |    GROUP BY 1, 2)
      |  GROUP BY doc_id)
      |SELECT d.doc_id, d.source,
      |  CAST(COALESCE(e.n_shared, 0) AS BIGINT) AS n_shared,
      |  COALESCE(f.max_est, 0.0) AS max_est,
      |  CASE WHEN COALESCE(e.n_shared, 0) >= 1 THEN 'exact'
      |       WHEN COALESCE(f.max_est, 0.0) >= 0.5 THEN 'fuzzy'
      |       ELSE 'clean' END AS verdict
      |FROM documents d
      |LEFT JOIN ex e ON e.doc_id = d.doc_id
      |LEFT JOIN fz f ON f.doc_id = d.doc_id
      |WHERE d.doc_id >= 50""".stripMargin

  /** Curriculum-phase gate ([[TrainingMix.curriculumPhases]]): documents
    * bucketed by exact token-count quartiles — short (easy) docs phase 0,
    * longest quartile phase 3. Counts per (source, phase) certify every
    * row's bucket; n_tok is integer-valued so the interpolated
    * thresholds are exact in both engines (the q32 discipline). */
  def q91Curriculum(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      size(filter(split(col("text"), " "), t => t =!= ""))
        .cast("long").as("n_tok"))
    TrainingMix.curriculumPhases(docs, "doc_id", "n_tok")
      .groupBy(col("source"), col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_sum"))
  }

  val q91CurriculumSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |qs AS (
      |  SELECT quantile_cont(n_tok, 0.25) AS p25,
      |         quantile_cont(n_tok, 0.5) AS p50,
      |         quantile_cont(n_tok, 0.75) AS p75
      |  FROM toks),
      |phased AS (
      |  SELECT doc_id, source,
      |    CASE WHEN n_tok < p25 THEN 0
      |         WHEN n_tok < p50 THEN 1
      |         WHEN n_tok < p75 THEN 2
      |         ELSE 3 END AS phase
      |  FROM toks, qs)
      |SELECT source, CAST(phase AS BIGINT) AS phase, COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM phased GROUP BY source, phase""".stripMargin

  /** Token-budget-fair weighted sample ([[TrainingMix.weightedTopKSample]]):
    * 100 docs without replacement, proportional to token count — the A-ES
    * keys come from the md5-derived uniform, so the oracle replays the
    * exact draw. */
  def q80WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= ""))
        .cast("long").as("n_tok"))
    TrainingMix.weightedTopKSample(docs, "doc_id", "n_tok", k = 100)
  }

  /** Domain-mix reweighting gate ([[TrainingMix.mixToBudget]]): cut the
    * corpus to a 6000-token budget at 30/20/10% for src0/1/2 and 2% per
    * remaining source — src0's rate clamps at 1.0 (keep-whole), the
    * others exercise the data-dependent thresholds. */
  private val mixTargets = Map("src0" -> 0.30, "src1" -> 0.20, "src2" -> 0.10)

  def q81MixBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      size(filter(split(col("text"), " "), t => t =!= ""))
        .cast("long").as("n_tok"))
    TrainingMix.mixToBudget(docs, "doc_id", "source", "n_tok",
      mixTargets, defaultFrac = 0.02, budgetTokens = 6000L)
  }

  val q81MixBudgetSql: String = {
    val cases = mixTargets.toSeq.sortBy(_._1)
      .map { case (s, f) => s"WHEN '$s' THEN $f" }.mkString(" ")
    s"""WITH docs AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |totals AS (SELECT source, SUM(n_tok) AS t_str FROM docs GROUP BY source),
      |thr AS (
      |  SELECT source,
      |    CAST(floor(least(1.0,
      |      (6000 * CASE source $cases ELSE 0.02 END) / t_str)
      |      * 4294967296.0) AS BIGINT) AS thr
      |  FROM totals)
      |SELECT d.doc_id, d.source, d.n_tok
      |FROM docs d JOIN thr USING (source)
      |WHERE ${hex8Sql("doc_id::VARCHAR || '#mix'")} < thr""".stripMargin
  }

  /** Per-source cap gate ([[TrainingMix.capPerStratum]]): at most 20 docs
    * per source, picked by hash rank — trims every source at sf0.01
    * (25/source) and sf0.1 (250/source), so the rank boundary is
    * exercised everywhere. */
  def q83SourceCap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    TrainingMix.capPerStratum(docs, "doc_id", "source", cap = 20)
  }

  val q83SourceCapSql: String =
    s"""WITH ranked AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ${hex8Sql("doc_id::VARCHAR || '#cap'")}, doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, source, rk FROM ranked WHERE rk <= 20""".stripMargin

  /** Temperature-mix gate ([[TrainingMix.temperatureMix]]): α = 0.5
    * source rebalancing to a 300-row budget — rare sources' SHARE rises
    * (mass ∝ √n_s), no row repeats, every source keeps ≥ 1 row. The
    * oracle replays the decimal-rounded power weights, the normalized
    * targets, and the hash-rank draw. */
  def q94TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    TrainingMix.temperatureMix(docs, "doc_id", "source",
      alpha = 0.5, budgetRows = 300L)
  }

  val q94TemperatureMixSql: String =
    s"""WITH counts AS (
      |  SELECT source, COUNT(*) AS n_src,
      |    CAST(round(pow(COUNT(*)::DOUBLE, 0.5), 6) AS DECIMAL(28,6)) AS p
      |  FROM documents GROUP BY source),
      |tot AS (SELECT SUM(p) AS s FROM counts),
      |targets AS (
      |  SELECT source,
      |    LEAST(n_src, GREATEST(1,
      |      CAST(round(300.0 * (p::DOUBLE / (SELECT s FROM tot)::DOUBLE))
      |        AS BIGINT))) AS t_src
      |  FROM counts),
      |ranked AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ${hex8Sql("doc_id::VARCHAR || '#tmp'")}, doc_id) AS rk
      |  FROM documents)
      |SELECT r.doc_id, r.source, r.rk, t.t_src
      |FROM ranked r JOIN targets t USING (source)
      |WHERE r.rk <= t.t_src""".stripMargin

  private val splitFracs =
    Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)

  /** Train/val/test split gate ([[TrainingMix.assignSplits]]): 80/10/10
    * over the corpus, counted per (source, split) so the gate certifies
    * both the row-level assignment (any relabeled row moves a count) and
    * the stratified-in-expectation property across all 20 sources. */
  def q84SplitAssign(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    TrainingMix.assignSplits(docs, "doc_id", splitFracs)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
  }

  val q84SplitAssignSql: String = {
    val thrs = TrainingMix.splitThresholds(splitFracs)
    val cases = thrs.init
      .map { case (name, thr) => s"WHEN u < $thr THEN '$name'" }
      .mkString(" ")
    s"""WITH labeled AS (
      |  SELECT doc_id, source,
      |    CASE $cases ELSE '${thrs.last._1}' END AS split
      |  FROM (SELECT doc_id, source,
      |          ${hex8Sql("doc_id::VARCHAR || '#split'")} AS u
      |        FROM documents))
      |SELECT source, split, COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM labeled GROUP BY source, split""".stripMargin
  }

  val q80WeightedSampleSql: String =
    s"""WITH docs AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |keyed AS (
      |  SELECT doc_id, n_tok,
      |    CAST(round((ln((CAST(${hex13Sql("doc_id::VARCHAR || '#aes'")} AS DOUBLE) + 0.5)
      |      / 4503599627370496.0) / n_tok) * 1e12) AS BIGINT) AS key_fp12
      |  FROM docs WHERE n_tok > 0)
      |SELECT CAST(row_number() OVER (ORDER BY key_fp12 DESC, doc_id) AS BIGINT) AS rank,
      |  doc_id, n_tok, key_fp12
      |FROM keyed
      |ORDER BY key_fp12 DESC, doc_id
      |LIMIT 100""".stripMargin

  /** q98: length-bucketed batch assignment
    * ([[TrainingMix.lengthBucketBatches]]) — pow-2 token caps, 4
    * deterministic shards per cap, batches of 8 cut by doc-id order.
    * `pad` certifies the padding saved vs corpus-max padding. */
  def q98LengthBatching(spark: SparkSession, dir: String): DataFrame =
    TrainingMix.lengthBucketBatches(Tables.documents(spark, dir),
        "doc_id", "text", batchSize = 8, shards = 4)
      .withColumnRenamed("id", "doc_id")

  val q98LengthBatchingSql: String = {
    val caseCaps = Iterator.iterate(32)(_ * 2).takeWhile(_ < 4096)
      .map(c => s"WHEN tokens <= $c THEN $c").mkString(" ")
    s"""WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    ${hex8Sql("doc_id::VARCHAR || '#batch'")} % 4 AS shard
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, tokens, shard,
      |    CAST(CASE $caseCaps ELSE 4096 END AS BIGINT) AS cap
      |  FROM t),
      |r AS (
      |  SELECT doc_id, tokens, cap, shard,
      |    CAST(row_number() OVER (PARTITION BY cap, shard ORDER BY doc_id)
      |      AS BIGINT) - 1 AS rn
      |  FROM b)
      |SELECT doc_id, tokens, cap, shard,
      |  rn // 8 AS seq, rn % 8 AS slot, cap - tokens AS pad
      |FROM r""".stripMargin
  }

  /** q130: per-source rank-normalized quality blend — raw quality signals
    * (length, lexical diversity) are incomparable across sources (a long
    * web page and a long code file mean different things), so curation
    * pipelines rank-normalize each signal WITHIN its source
    * (percent_rank), blend the normalized ranks, and take the top slice
    * per source. Selection thresholds on the fixed-point blend keep every
    * comparison integer-exact cross-engine. Scale shape: both windows
    * share one `source` hash-partitioning (one shuffle, two in-partition
    * sorts), and the final per-source top-k is a WindowGroupLimit —
    * no global sort anywhere. */
  def q130QualityBlend(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val base = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      size(toks).cast("long").as("n_tokens"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("diversity"))
    val wLen = Window.partitionBy(col("source")).orderBy(col("n_tokens"))
    val wDiv = Window.partitionBy(col("source")).orderBy(col("diversity"))
    val blended = base
      .withColumn("pr_len", percent_rank().over(wLen))
      .withColumn("pr_div", percent_rank().over(wDiv))
      .withColumn("blend_fp6",
        round((lit(0.5) * col("pr_len") + lit(0.5) * col("pr_div")) * lit(1e6))
          .cast("long"))
    val wTop = Window.partitionBy(col("source"))
      .orderBy(col("blend_fp6").desc, col("doc_id"))
    blended.withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("source"), col("rank"), col("doc_id"), col("blend_fp6"))
  }

  val q130QualityBlendSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS diversity
      |  FROM documents),
      |pr AS (
      |  SELECT doc_id, source,
      |    percent_rank() OVER (PARTITION BY source ORDER BY n_tokens) AS pr_len,
      |    percent_rank() OVER (PARTITION BY source ORDER BY diversity) AS pr_div
      |  FROM base),
      |blended AS (
      |  SELECT doc_id, source,
      |    CAST(round((0.5 * pr_len + 0.5 * pr_div) * 1000000.0) AS BIGINT)
      |      AS blend_fp6
      |  FROM pr)
      |SELECT source,
      |  CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY blend_fp6 DESC, doc_id) AS BIGINT) AS rank,
      |  doc_id, blend_fp6
      |FROM blended
      |QUALIFY rank <= 10""".stripMargin

  /** q136: signal-calibration report — duplicate rate per lexical-
    * diversity band. The sanity check behind every heuristic quality
    * filter: does the cheap signal (distinct-token ratio) actually
    * separate the behavior it claims to proxy (exact duplication)?
    * Bucketing is a pure row-local projection (floor of an exact
    * integer-ratio double — no global ntile sort, so it scales as a
    * projection); duplicate flags come from one md5 groupBy (the q16
    * pipeline); the report is a 10-row aggregate. */
  def q136Calibration(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val d = Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(col("text")).as("h"),
      least(floor(
        (size(array_distinct(toks)).cast("double") / size(toks)) * lit(10)),
        lit(9L)).cast("long").as("band"))
    val dupCnt = d.groupBy(col("h")).agg(count(lit(1)).as("c"))
    d.join(dupCnt, Seq("h"))
      .withColumn("is_dup", (col("c") > 1).cast("long"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("is_dup")).as("n_dup"))
      .select(col("band"), col("n"), col("n_dup"),
        round(col("n_dup").cast("double") * lit(1e6) / col("n"))
          .cast("long").as("dup_rate_fp6"))
  }

  val q136CalibrationSql: String =
    """WITH d AS (
      |  SELECT doc_id, md5(text) AS h,
      |    CAST(least(floor(
      |      (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |        / len(string_split(text, ' '))) * 10), 9) AS BIGINT) AS band
      |  FROM documents),
      |dupcnt AS (SELECT h, COUNT(*) AS c FROM d GROUP BY h)
      |SELECT band, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  CAST(round(CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    * 1000000.0 / COUNT(*)) AS BIGINT) AS dup_rate_fp6
      |FROM d JOIN dupcnt USING (h)
      |GROUP BY band""".stripMargin

  /** q160: token-budget epochs planner — given the q94 temperature
    * weights (α = 0.5 on TOKEN mass) and a fixed training budget, how
    * many epochs of each source does the mix imply? `epochs > 4` is the
    * Muennighoff et al. 2023 ("Scaling Data-Constrained Language
    * Models") diminishing-returns flag — the number a mix designer
    * checks before committing weights. Same decimal-rounded weight sum
    * as q94 (order-free); everything downstream is source-sized. */
  def q160EpochsPlanner(spark: SparkSession, dir: String): DataFrame = {
    val budget = 1000000.0
    val counts = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("p", round(pow(col("n_tokens").cast("double"), 0.5), 6)
        .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
    val tot = counts.agg(sum(col("p")).as("s"))
    counts.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        round(lit(budget) * (col("p").cast("double") / col("s").cast("double")))
          .cast("long"))
      .select(col("source"), col("n_tokens"), col("target_tokens"),
        round(col("target_tokens").cast("double") * lit(1e6) / col("n_tokens"))
          .cast("long").as("epochs_fp6"))
      .withColumn("over_4_epochs", col("epochs_fp6") > 4000000L)
  }

  val q160EpochsPlannerSql: String =
    """WITH counts AS (
      |  SELECT source,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_tokens,
      |    CAST(round(pow(n_tokens::DOUBLE, 0.5), 6) AS DECIMAL(28,6)) AS p
      |  FROM counts),
      |tot AS (SELECT SUM(p) AS s FROM w),
      |t AS (
      |  SELECT source, n_tokens,
      |    CAST(round(1000000.0 * (p::DOUBLE / (SELECT s FROM tot)::DOUBLE))
      |      AS BIGINT) AS target_tokens
      |  FROM w)
      |SELECT source, n_tokens, target_tokens,
      |  CAST(round(CAST(target_tokens AS DOUBLE) * 1000000.0 / n_tokens)
      |    AS BIGINT) AS epochs_fp6,
      |  CAST(round(CAST(target_tokens AS DOUBLE) * 1000000.0 / n_tokens)
      |    AS BIGINT) > 4000000 AS over_4_epochs
      |FROM t""".stripMargin

  /** q155: leakage-free split — the q84 assignment keyed by the DEDUP
    * GROUP (q62 near-dup cluster rep; singletons key on themselves), so
    * every near-duplicate family lands in ONE split and test data cannot
    * leak into train through a paraphrase (Lee et al. 2022's
    * deduplication-before-splitting argument). Same md5 hash rule and
    * thresholds as q84 — only the key changes; the per-split group and
    * doc counts certify that group-keyed assignment moved WHOLE clusters
    * (any straddler would change two rows). */
  def q155LeakFreeSplit(spark: SparkSession, dir: String): DataFrame = {
    val clusters = DedupQueries.q62DedupGroups(spark, dir)
    val keyed = Tables.documents(spark, dir).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep_id"), col("doc_id")).as("grp"))
    TrainingMix.assignSplits(keyed, "grp", splitFracs)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("grp")).as("n_groups"),
        sum(col("doc_id")).as("id_sum"))
  }

  val q155LeakFreeSplitSql: String = {
    val thrs = TrainingMix.splitThresholds(splitFracs)
    val cases = thrs.init
      .map { case (name, thr) => s"WHEN u < $thr THEN '$name'" }
      .mkString(" ")
    s"""WITH RECURSIVE ${OracleFragments.minhashSigCtes("documents")},
      |cand AS (
      |  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b
      |  FROM sig s1
      |  JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) / 8.0 >= 0.5),
      |sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM cand
      |  UNION ALL
      |  SELECT id_b, id_a FROM cand),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id),
      |clusters AS (
      |  SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS rep_id
      |  FROM reach GROUP BY id),
      |keyed AS (
      |  SELECT d.doc_id, COALESCE(c.rep_id, d.doc_id) AS grp
      |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id),
      |labeled AS (
      |  SELECT doc_id, grp,
      |    CASE $cases ELSE '${thrs.last._1}' END AS split
      |  FROM (SELECT doc_id, grp,
      |          ${hex8Sql("grp::VARCHAR || '#split'")} AS u
      |        FROM keyed))
      |SELECT split, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM labeled GROUP BY split""".stripMargin
  }

  /** q180: rendezvous (highest-random-weight) shard rebalance audit —
    * the shard-assignment scheme whose defining property is MINIMAL
    * MOVEMENT: growing 8 → 9 shards must relocate ≈ 1/9 of keys, only
    * ever INTO the new shard, and a modulo partitioner would relocate
    * ~8/9 instead. Per document, shard = argmax over shards of
    * md5(doc_id:shard) (engine-portable, the hyperplane discipline);
    * both assignments are per-row expressions over a literal shard list
    * — zero shuffle until the final per-shard count. The gate reports,
    * per old shard, the exact moved count plus the invariant that every
    * move targets shard 8. */
  def q180RendezvousRebalance(spark: SparkSession, dir: String): DataFrame = {
    def shardOf(n: Int): Column = {
      val entries = (0 until n).map { s =>
        struct(md5(concat(col("doc_id").cast("string"), lit(s":$s"))).as("h"),
          lit(s.toLong).as("shard"))
      }
      array_max(array(entries: _*)).getField("shard")
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), shardOf(8).as("s8"), shardOf(9).as("s9"))
      .groupBy(col("s8").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("s9") =!= col("s8")).cast("long")).as("n_moved"),
        sum((col("s9") =!= col("s8") && col("s9") =!= 8L).cast("long"))
          .as("n_moved_elsewhere"),
        round(lit(1e6) * sum((col("s9") =!= col("s8")).cast("long"))
          / count(lit(1))).cast("long").as("moved_fp6"))
  }

  val q180RendezvousRebalanceSql: String =
    """WITH a8 AS (
      |  SELECT doc_id, arg_max(s, md5(doc_id || ':' || s)) AS s8
      |  FROM documents CROSS JOIN range(8) r(s) GROUP BY doc_id),
      |a9 AS (
      |  SELECT doc_id, arg_max(s, md5(doc_id || ':' || s)) AS s9
      |  FROM documents CROSS JOIN range(9) r(s) GROUP BY doc_id)
      |SELECT CAST(a8.s8 AS BIGINT) AS shard, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN a9.s9 <> a8.s8 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_moved,
      |  CAST(SUM(CASE WHEN a9.s9 <> a8.s8 AND a9.s9 <> 8
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_elsewhere,
      |  CAST(round(1e6 * SUM(CASE WHEN a9.s9 <> a8.s8 THEN 1 ELSE 0 END)
      |    / COUNT(*)) AS BIGINT) AS moved_fp6
      |FROM a8 JOIN a9 USING (doc_id)
      |GROUP BY 1""".stripMargin

  /** q189: DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") — per document,
    * the hashed-bigram log-likelihood ratio between a target domain
    * (source `src0`) and the raw corpus: `Σ_grams ln p̂_t(b)/p̂_r(b)`
    * over 2¹⁶ md5 hash buckets with add-one smoothing. Positive weight
    * means "looks like the target"; importance resampling then keeps
    * raw docs proportionally. Reported per source as the mix-decision
    * table (mean weight + count of target-leaning docs).
    *
    * Determinism: per-bucket λ terms are fp9-rounded integers BEFORE
    * any per-doc sum (the q97/q181 discipline), the bucket is the
    * engine-portable md5 uniform, and the smoothed ratios divide
    * exact integers in IEEE doubles — both engines feed `ln` the same
    * value. Scale shape: the model is ONE 65,536-row table (a
    * broadcast, never a vocabulary build); the corpus gram stream is
    * touched twice (count pass, score pass) with no materialization —
    * at 100 TB both passes are embarrassingly parallel projections
    * into a map-side-combined bucket aggregate. */
  def q189DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val dim = 65536
    val toks = split(col("text"), " ")
    // ONE hash pass over the gram stream, immediately compressed to
    // (doc, bucket, cnt) and barriered: the model aggregate and the
    // scoring join both read the compact table, so the corpus is
    // tokenized and md5'd exactly once (the un-barriered two-pass form
    // re-ran the explode+hash per consumer — measured 2.5× slower)
    val gb = Tables.spread(Tables.documents(spark, dir))
      .filter(size(toks) >= 2)
      // zip of two shifted slices — the element_at probe form re-ran
      // the split per element (the q158 interpreted-HOF probe class)
      .select(col("doc_id"), col("source"), explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
        .as("g"))
      .select(col("doc_id"), col("source"),
        (TrainingMix.hex8(concat(col("g"), lit("#dsir"))) % dim).as("bucket"))
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val w = gb.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("cr"),
        sum(when(col("source") === "src0", col("cnt")).otherwise(lit(0L))).as("ct"))
    val tot = w.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val lam = w.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(lit(1e9) * (
          log((col("ct") + 1).cast("double") /
              (col("nt") + lit(dim.toLong)).cast("double")) -
          log((col("cr") + 1).cast("double") /
              (col("nr") + lit(dim.toLong)).cast("double"))))
          .cast("long").as("lam_fp9"))
    val perDoc = gb.join(broadcast(lam), Seq("bucket"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("lam_fp9") * col("cnt")).as("w_fp9"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("w_fp9")).cast("double") / count(lit(1))).cast("long")
          .as("mean_w_fp9"),
        sum(when(col("w_fp9") > 0, lit(1L)).otherwise(lit(0L))).as("n_pos"))
  }

  val q189DsirWeightsSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |g AS (
      |  SELECT doc_id, source, t[i] || ' ' || t[i + 1] AS g FROM (
      |    SELECT doc_id, source, t, unnest(generate_series(1, len(t) - 1)) AS i
      |    FROM toks WHERE len(t) >= 2)),
      |gb AS (
      |  SELECT doc_id, source,
      |    ${hex8Sql("g || '#dsir'")} % 65536 AS bucket FROM g),
      |w AS (
      |  SELECT bucket, COUNT(*) AS cr,
      |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct
      |  FROM gb GROUP BY 1),
      |tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM w),
      |lam AS (
      |  SELECT bucket,
      |    CAST(round(1e9 * (ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + 65536 AS DOUBLE))
      |      - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + 65536 AS DOUBLE))))
      |      AS BIGINT) AS lam_fp9
      |  FROM w CROSS JOIN tot),
      |pd AS (
      |  SELECT doc_id, source, SUM(lam_fp9) AS w_fp9
      |  FROM gb JOIN lam USING (bucket) GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(round(CAST(SUM(w_fp9) AS DOUBLE) / COUNT(*)) AS BIGINT)
      |    AS mean_w_fp9,
      |  CAST(SUM(CASE WHEN w_fp9 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      |FROM pd GROUP BY source""".stripMargin

  /** q213: Horvitz–Thompson estimation audit of the q51 stratified
    * sampler — per language, the inverse-inclusion-probability estimate
    * of total char mass from the SAMPLE alone versus the true total:
    * the check that certifies the deterministic md5 sampler is not just
    * reproducible but USABLE for estimation (an HT estimate off by 40%
    * would mean the "uniform" is biased). Relative error lands within
    * ordinary sampling noise for every stratum; the weights
    * `w = 1/rate` are fp6-quantized Scala literals so the weighted sum
    * is an exact integer — reduction-order-free — and the only doubles
    * are the final two shared divisions.
    *
    * Scale shape: the sampler is a per-row hash filter; both branches
    * (sample aggregate, truth aggregate) are language-sized — two
    * corpus scans, constant shuffle. */
  def q213HtEstimate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val wFp6 = (langRates.view.mapValues(r => math.round(1e6 / r)).toMap,
      math.round(1e6 / defaultRate))
    val wCol = wFp6._1.foldLeft(lit(wFp6._2)) { case (acc, (l, w)) =>
      when(col("lang") === l, lit(w)).otherwise(acc)
    }
    val sampled = TrainingMix.stratifiedSample(d, "doc_id", "lang",
        langRates, defaultRate)
      .groupBy(col("lang"))
      // 128-bit accumulator (the q175/q190 discipline): per-row terms
      // reach ~1e11 with the 1e7 fp6 default-rate weight, so a plain
      // LongType sum can wrap at very large SF while DuckDB's SUM widens
      // to HUGEINT — the Decimal(38,0) sum keeps both engines exact
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_chars").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * wCol).as("ht_fp6"))
    val truth = d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("true_chars"))
    truth.join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"), col("true_chars"),
        round(coalesce(col("ht_fp6"), lit(0L)).cast("double") / lit(1e6))
          .cast("long").as("ht_chars"),
        round(lit(1e6) *
          (coalesce(col("ht_fp6"), lit(0L)).cast("double") / lit(1e6)
            - col("true_chars")) / col("true_chars"))
          .cast("long").as("rel_err_fp6"))
  }

  val q213HtEstimateSql: String = {
    val thr = (r: Double) => (r * 4294967296.0).toLong
    val cases = langRates.map { case (l, r) => s"WHEN '$l' THEN ${thr(r)}" }.mkString(" ")
    val wCases = langRates
      .map { case (l, r) => s"WHEN '$l' THEN ${math.round(1e6 / r)}" }.mkString(" ")
    s"""WITH s AS (
      |  SELECT lang, COUNT(*) AS n_sampled,
      |    SUM(CAST(n_chars AS HUGEINT) * CASE lang $wCases
      |      ELSE ${math.round(1e6 / defaultRate)} END) AS ht_fp6
      |  FROM documents
      |  WHERE ${hex8Sql("doc_id::VARCHAR || '#smp'")} <
      |    CASE lang $cases ELSE ${thr(defaultRate)} END
      |  GROUP BY 1),
      |t AS (
      |  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT)
      |    AS true_chars
      |  FROM documents GROUP BY 1)
      |SELECT t.lang, t.n_docs,
      |  CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled, t.true_chars,
      |  CAST(round(CAST(COALESCE(s.ht_fp6, 0) AS DOUBLE) / 1e6) AS BIGINT)
      |    AS ht_chars,
      |  CAST(round(1e6 * (CAST(COALESCE(s.ht_fp6, 0) AS DOUBLE) / 1e6
      |    - t.true_chars) / t.true_chars) AS BIGINT) AS rel_err_fp6
      |FROM t LEFT JOIN s USING (lang)""".stripMargin
  }

  /** q224: weighted sampling without replacement (Efraimidis–Spirakis
    * A-Res): each doc draws the deterministic md5 uniform u ∈ (0, 1] and
    * scores key = ln(u)/w with w = n_chars; the k largest keys are the
    * sample — provably equivalent to sequential draws with probability
    * proportional to weight, but embarrassingly parallel. Keys are
    * fp12-rounded (order-free ln) and ties break on doc_id, so the
    * selected SET is identical across engines.
    *
    * Scale: ORDER BY key LIMIT k plans as TakeOrderedAndProject —
    * per-partition k-row heaps merged on the driver, never a global
    * sort; one corpus scan, zero shuffles. This is the standard
    * distributed weighted-reservoir form.
    */
  def q224WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = (TrainingMix.hex8(concat(col("doc_id").cast("string"),
      lit("#wrs"))) + 1).cast("double") / lit(4294967296.0)
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars").as("w"),
        round(log(u) / col("n_chars").cast("double") * lit(1e12))
          .cast("long").as("key_fp12"))
      .orderBy(col("key_fp12").desc, col("doc_id"))
      .limit(100)
  }

  /** q243: DoReMi-lite domain reweighting (Xie et al. 2023's minimax
    * objective collapsed to its one-step proxy): each source's training
    * share is multiplied by exp(η·excess) where excess = max(0, its mean
    * LM bits − the corpus mean) — domains the reference model finds
    * HARDER get upweighted; already-easy domains keep their natural
    * share. Per-source means come from exact integer bit sums (the q144
    * model over ALL docs); the single exp per source is fp9-rounded
    * before the exact-integer normalization, so weights sum to ~1e9 and
    * agree bit-for-bit across engines.
    *
    * Scale: the corpus is touched by the scoring pass only; everything
    * here is a sources-sized grid (one window over ≤sources rows).
    */
  def q243DoremiWeights(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eta = 1.0
    val perSrc = AuditQueries.bigramBitsAll(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bits_fp6")).as("sb"))
    val wAll = Window.partitionBy()
    val withTot = perSrc
      .withColumn("nn", sum(col("n_docs")).over(wAll))
      .withColumn("sbAll", sum(col("sb")).over(wAll))
      .withColumn("mean6",
        round(col("sb").cast("double") / col("n_docs").cast("double"))
          .cast("long"))
      .withColumn("meanAll6",
        round(col("sbAll").cast("double") / col("nn").cast("double"))
          .cast("long"))
      .withColumn("excess6",
        greatest(lit(0L), col("mean6") - col("meanAll6")))
      .withColumn("raw9",
        round(lit(1e9) * (col("n_docs").cast("double") /
          col("nn").cast("double")) *
          exp(lit(eta) * col("excess6").cast("double") / lit(1e6)))
          .cast("long"))
    withTot
      .withColumn("weight_fp9",
        round(lit(1e9) * col("raw9").cast("double") /
          sum(col("raw9")).over(wAll).cast("double")).cast("long"))
      .select(col("source"), col("n_docs"), col("mean6").as("mean_bits_fp6"),
        col("excess6").as("excess_fp6"), col("weight_fp9"))
  }

  val q243DoremiWeightsSql: String =
    s"""WITH ${AuditQueries.bigramBitsAllSql},
      |ps AS (
      |  SELECT d.source, COUNT(*) AS n_docs,
      |    CAST(SUM(b.bits_fp6) AS BIGINT) AS sb
      |  FROM bits b JOIN documents d ON b.doc_id = d.doc_id
      |  GROUP BY 1),
      |w AS (
      |  SELECT source, n_docs, sb,
      |    CAST(SUM(n_docs) OVER () AS BIGINT) AS nn,
      |    CAST(SUM(sb) OVER () AS BIGINT) AS sb_all
      |  FROM ps),
      |x AS (
      |  SELECT source, n_docs,
      |    CAST(round(CAST(sb AS DOUBLE) / CAST(n_docs AS DOUBLE))
      |      AS BIGINT) AS mean6,
      |    GREATEST(0,
      |      CAST(round(CAST(sb AS DOUBLE) / CAST(n_docs AS DOUBLE))
      |        AS BIGINT)
      |      - CAST(round(CAST(sb_all AS DOUBLE) / CAST(nn AS DOUBLE))
      |        AS BIGINT)) AS excess6,
      |    nn
      |  FROM w),
      |r AS (
      |  SELECT source, n_docs, mean6, excess6,
      |    CAST(round(1e9 * (CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE))
      |      * exp(1.0 * CAST(excess6 AS DOUBLE) / 1e6)) AS BIGINT) AS raw9
      |  FROM x)
      |SELECT source, n_docs, mean6 AS mean_bits_fp6,
      |  excess6 AS excess_fp6,
      |  CAST(round(1e9 * CAST(raw9 AS DOUBLE)
      |    / CAST(SUM(raw9) OVER () AS DOUBLE)) AS BIGINT) AS weight_fp9
      |FROM r""".stripMargin

  val q224WeightedSampleSql: String =
    s"""SELECT doc_id, n_chars AS w,
       |  CAST(round(ln(CAST(${hex8Sql("doc_id::VARCHAR || '#wrs'")} + 1
       |      AS DOUBLE) / 4294967296.0)
       |    / CAST(n_chars AS DOUBLE) * 1e12) AS BIGINT) AS key_fp12
       |FROM documents WHERE n_chars > 0
       |ORDER BY key_fp12 DESC, doc_id LIMIT 100""".stripMargin

  /** q244: the END-TO-END curation pipeline as ONE gated lineage — the
    * composition a 100 TB training-data run actually executes, where
    * every stage consumes the PREVIOUS stage's survivors (not the raw
    * corpus):
    *
    *   1. quality gate (q67 rule): keep docs at/above their own
    *      source's median quality;
    *   2. exact dedup (q16 rule): keep the min-id representative of
    *      each text hash;
    *   3. span strip (q93 rule): remove 8-token windows duplicated
    *      WITHIN the surviving corpus, drop docs stripped to nothing;
    *   4. near-dup canonical (q24+q62+q88 rule): MinHash ≥ 0.5 over
    *      the CLEAN text → connected components → keep-longest;
    *   5. decontamination (q126 rule): drop survivors sharing an exact
    *      5-gram OR a ≥ 0.5 MinHash match with the untouched benchmark
    *      slice (doc_id < 50, original text — the eval set as
    *      published);
    *   6. mix-to-budget (q81 rule) over surviving clean-token mass;
    *   7. leakage-free split (q155 rule) keyed by the stage-4 cluster
    *      rep, so near-dup families never straddle splits;
    *   8. pack (q52 rule): greedy 1024-token sequences over the train
    *      split, 8 hash shards.
    *
    * Output: the funnel — one row per stage with survivor count, token
    * mass, and id checksum (plus stage-specific evidence: span tokens
    * removed, cluster count, exact/fuzzy contamination attribution,
    * per-split group counts, packed-sequence count and offset sum) —
    * the q155 counts-certification style: any row-level divergence at
    * ANY stage moves a checksum, and the oracle replays the whole
    * chain. Stage rules reuse their individually-gated constructions
    * verbatim, so this gate certifies the COMPOSITION (stage wiring,
    * survivor threading, recompute-on-survivors semantics), which no
    * single-stage gate covers.
    *
    * Scale shape: the raw corpus is scanned exactly twice (curated
    * slice once — persisted, all stages derive from it — and the
    * benchmark slice once); every stage output is persisted/
    * checkpointed once and read by its consumers, tables only shrink,
    * and the per-stage operators keep their own certified scale shapes
    * (banded LSH, component propagation, broadcast thresholds,
    * sharded packing). Funnel rows for the barriered stages ride the
    * barrier jobs themselves as observed metrics (CollectMetrics on
    * the materialization action — the CC-loop discipline), so the
    * final job aggregates only the frames nothing else materialized
    * (s1, the contamination attribution, splits, pack): at 100 TB the
    * funnel costs zero extra passes over any stage table. */
  def q244CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.{Observation, Row}
    import graft.ops.{Dedup, SpanDedup, TextOps}
    // Funnel rows for the barriered stages RIDE the barrier jobs as
    // observed metrics (the CC-loop discipline, Dedup.scala: metrics
    // arrive on the materialization action's listener event, with a
    // direct-aggregate fallback on the never-yet-seen timeout) — the
    // former form re-scanned every persisted stage in the final job
    // purely to re-aggregate what the barrier had already streamed past.
    def longAt(r: Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else r.getLong(i)
    // r17 (advice): by the time riding() runs every barrier action has
    // already completed, so the metrics are normally delivered — a short
    // timeout suffices, and a LONG one compounds: 7 sequential awaits ×
    // 60 s stalled gate construction ~7 min if the listener bus dropped
    // events under load (a known Spark failure mode). 5 s each bounds
    // the worst case at ~35 s, and ANY failure (interrupt, bus death)
    // takes the same correct direct-aggregate fallback as a timeout.
    def riding(obs: Observation, fallback: => Row): Row =
      try scala.concurrent.Await
        .result(obs.future, scala.concurrent.duration.Duration(5, "s"))
      catch {
        case _: InterruptedException =>
          Thread.currentThread().interrupt()
          System.err.println(
            "[q244] observation await interrupted — direct-aggregate fallback")
          fallback
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[q244] observation unavailable (${e.getClass.getSimpleName}) " +
              "— direct-aggregate fallback")
          fallback
      }
    val docsAll = Tables.documents(spark, dir)
    val tok0 = size(filter(split(col("text"), " "), t => t =!= "")).cast("long")
    val en = TextOps.langProfiles.head._2
    // stage 0: curated slice, scored once — ONE corpus scan feeds the
    // whole curation side (the benchmark slice below is the only other)
    val d0 = Tables.spread(docsAll.filter(col("doc_id") >= 50))
      .select(col("doc_id"), col("source"), col("text"), tok0.as("n_tok0"),
        TextOps.qualityScore(col("text"), en).as("quality"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val o0 = Observation()
    d0.observe(o0, count(lit(1)).as("n"), sum(col("n_tok0")).as("t"),
      sum(col("doc_id")).as("i")).count()
    // 1. per-source median quality gate
    val med = d0.groupBy(col("source"))
      .agg(expr("percentile(quality, 0.5)").as("m"))
    val s1 = d0.join(broadcast(med), "source")
      .filter(col("quality") >= col("m"))
      .select(col("doc_id"), col("source"), col("text"), col("n_tok0"))
    // 2. exact dedup: min-id representative per text hash. (s1 is NOT
    // observed: it appears twice in this stage's plan — the reps
    // aggregate and the semi-join probe — so a CollectMetrics node on it
    // would double-fire; its funnel row stays a lazy branch over the
    // cached d0.)
    val reps = s1.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val s2 = s1.join(reps.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val o2 = Observation()
    s2.observe(o2, count(lit(1)).as("n"), sum(col("n_tok0")).as("t"),
      sum(col("doc_id")).as("i")).count()
    // 3. strip spans duplicated within the SURVIVING corpus; drop docs
    // stripped to nothing (clean_tok = filtered tokens minus removed)
    val s3 = SpanDedup.removeDupSpans(s2, "doc_id", "text",
        DedupQueries.SpanWidth)
      .withColumn("clean_tok", col("n_tok") - col("n_removed"))
      .filter(col("clean_tok") >= 1L)
      .join(s2.select(col("doc_id"), col("source")), "doc_id")
      .select(col("doc_id"), col("source"), col("clean_text"),
        col("clean_tok"), col("n_removed"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val o3 = Observation()
    s3.observe(o3, count(lit(1)).as("n"), sum(col("clean_tok")).as("t"),
      sum(col("doc_id")).as("i"), sum(col("n_removed")).as("rm")).count()
    // 4. near-dup components over CLEAN text, keep-longest canonical.
    // Signatures are computed ONCE here and reused by the stage-5 fuzzy
    // decontamination (signatures are a per-doc pure function, so the
    // stage-4 survivor restriction is a semi-join on the cached table,
    // not a second shingle+md5 pass over the corpus)
    val sigs = Dedup.minhashSignatures(s3, "doc_id", "clean_text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // no eager count: the FIRST consumer (cand → members.count() below)
    // materializes the cache before the second (stage-5 fIds) exists —
    // an extra barrier job here bought nothing but driver latency
    val cand = Dedup.candidatesFromSignatures(sigs, numHashes = 8)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    // n_groups rides the members barrier: converged min-label CC gives
    // every component exactly one self-labeled row (the min-id node has
    // rep == id — DedupSpec pins the identity against countDistinct),
    // so the distinct-rep count is a plain observable sum. r17 (advice):
    // that identity holds ONLY for converged labels, and the plain entry
    // point merely warns on maxIter exhaustion — this gate asserts
    // convergence (generous bound; doubling needs O(log diameter) rounds)
    // so a non-converged run fails loudly instead of reporting a silently
    // wrong group count.
    val (ccLabels, _, ccConverged) =
      Dedup.ccWithRounds(cand, maxIter = 100, doubling = true)
    require(ccConverged,
      "q244 near-dup CC did not converge at maxIter=100 — the funnel's " +
        "n_groups identity (sum of rep==id) requires converged labels")
    val members = ccLabels.persist(StorageLevel.MEMORY_AND_DISK)
    val oM = Observation()
    members.observe(oM, sum(when(col("rep") === col("id"), 1L)
      .otherwise(0L)).as("g")).count()
    val dropNd = Dedup.canonicalByScore(members,
        s3.select(col("doc_id"), col("clean_tok")), "doc_id", "clean_tok")
      .filter(!col("keep")).select(col("id").as("doc_id"))
    val s4 = s3.join(dropNd, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val o4 = Observation()
    s4.observe(o4, count(lit(1)).as("n"), sum(col("clean_tok")).as("t"),
      sum(col("doc_id")).as("i")).count()
    // 5. decontamination vs the untouched benchmark slice
    val bench = docsAll.filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text").as("clean_text"))
    // both contamination channels materialize in ONE checkpoint job (a
    // kind-tagged union) instead of two — each side is consumed three
    // times below (fOnly anti-join, the s5 filter, the funnel counts),
    // so the barrier stays; only the second driver round-trip goes
    val exactIds = TrainingMix.contamination(
        s4.select(col("doc_id"), col("clean_text")), bench,
        "doc_id", "clean_text", n = 5)
      .select(col("id").as("doc_id"))
    val fuzzyIds = Dedup.crossCandidatesFromSignatures(
        sigs.join(s4.select(col("doc_id").as("id")), Seq("id"), "left_semi"),
        Dedup.minhashSignatures(bench, "doc_id", "clean_text"),
        numHashes = 8)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("corpus_id").as("doc_id")).distinct()
    val contam = exactIds.withColumn("kind", lit("e"))
      .unionByName(fuzzyIds.withColumn("kind", lit("f")))
      .localCheckpoint()
    val eIds = contam.filter(col("kind") === "e").select(col("doc_id"))
    val fIds = contam.filter(col("kind") === "f").select(col("doc_id"))
    val fOnly = fIds.join(eIds, Seq("doc_id"), "left_anti")
    val s5 = s4.join(eIds.union(fIds).distinct(), Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val o5 = Observation()
    s5.observe(o5, count(lit(1)).as("n"), sum(col("clean_tok")).as("t"),
      sum(col("doc_id")).as("i")).count()
    // 6. mix to the 6000-token budget over clean-token mass. s6 has
    // exactly ONE consumer (the keyed join below), so its funnel row
    // rides the labeled checkpoint as an observation instead of a
    // second mixToBudget execution in the final job.
    val o6 = Observation()
    val s6raw = TrainingMix.mixToBudget(
      s5.select(col("doc_id"), col("source"), col("clean_tok")),
      "doc_id", "source", "clean_tok", mixTargets,
      defaultFrac = 0.02, budgetTokens = 6000L)
    val s6 = s6raw.observe(o6, count(lit(1)).as("n"),
      sum(col("clean_tok")).as("t"), sum(col("doc_id")).as("i"))
    // 7. leakage-free split keyed by the stage-4 cluster rep
    val keyed = s6
      .join(members.select(col("id").as("doc_id"), col("rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("clean_tok"),
        coalesce(col("rep"), col("doc_id")).as("grp"))
    val labeled = TrainingMix.assignSplits(keyed, "grp", splitFracs)
      .localCheckpoint() // feeds three split rows + the pack stage
    // 8. pack the train split into 1024-token sequences, 8 shards
    val packed = TrainingMix.packSequences(
      labeled.filter(col("split") === "train")
        .join(s5.select(col("doc_id"), col("clean_text")), "doc_id"),
      "doc_id", "clean_text", budgetTokens = 1024L, shards = 8)
    // ---- the funnel ----
    // Barriered stages' rows are LITERALS assembled from the riding
    // observations (every barrier above has already run by this point);
    // only the never-materialized frames (s1, the contamination
    // attribution, splits, pack) still aggregate in the final job.
    val r0 = riding(o0,
      d0.agg(count(lit(1)), sum(col("n_tok0")), sum(col("doc_id"))).head())
    val r2 = riding(o2,
      s2.agg(count(lit(1)), sum(col("n_tok0")), sum(col("doc_id"))).head())
    val r3 = riding(o3, s3.agg(count(lit(1)), sum(col("clean_tok")),
      sum(col("doc_id")), sum(col("n_removed"))).head())
    val rM = riding(oM, members.agg(countDistinct(col("rep"))).head())
    val r4 = riding(o4,
      s4.agg(count(lit(1)), sum(col("clean_tok")), sum(col("doc_id"))).head())
    val r5 = riding(o5,
      s5.agg(count(lit(1)), sum(col("clean_tok")), sum(col("doc_id"))).head())
    val r6 = riding(o6,
      s6raw.agg(count(lit(1)), sum(col("clean_tok")), sum(col("doc_id"))).head())
    import spark.implicits._
    def lrow(stage: String, n: Long, g: Long, t: Long, i: Long,
        aux: Long): DataFrame =
      Seq((stage, n, g, t, i, aux))
        .toDF("stage", "n_docs", "n_groups", "n_tokens", "id_sum", "aux")
    def z(c: org.apache.spark.sql.Column) = coalesce(c, lit(0L))
    def row(stage: String, df: DataFrame, tokCol: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("t"),
          sum(col("doc_id")).as("i"))
        .select(lit(stage).as("stage"), col("n_docs"),
          lit(0L).as("n_groups"), z(col("t")).as("n_tokens"),
          z(col("i")).as("id_sum"), lit(0L).as("aux"))
    val fDecon = fOnly.agg(count(lit(1)).as("n_groups"))
      .crossJoin(eIds.agg(count(lit(1)).as("aux")))
      .select(lit("decontam").as("stage"), lit(longAt(r5, 0)).as("n_docs"),
        col("n_groups"), lit(longAt(r5, 1)).as("n_tokens"),
        lit(longAt(r5, 2)).as("id_sum"), col("aux"))
    val fSplit = labeled.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("grp")).as("n_groups"),
        sum(col("clean_tok")).as("t"), sum(col("doc_id")).as("i"))
      .select(concat(lit("split_"), col("split")).as("stage"),
        col("n_docs"), col("n_groups"), z(col("t")).as("n_tokens"),
        z(col("i")).as("id_sum"), lit(0L).as("aux"))
    val fPack = packed.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("shard") * 1000000L + col("seq")).as("n_groups"),
        sum(col("tokens")).as("t"), sum(col("id")).as("i"),
        sum(col("tok_start")).as("ts"))
      .select(lit("pack").as("stage"), col("n_docs"), col("n_groups"),
        z(col("t")).as("n_tokens"), z(col("i")).as("id_sum"),
        z(col("ts")).as("aux"))
    lrow("input", longAt(r0, 0), 0L, longAt(r0, 1), longAt(r0, 2), 0L)
      .unionByName(row("quality", s1, "n_tok0"))
      .unionByName(lrow("exact_dedup",
        longAt(r2, 0), 0L, longAt(r2, 1), longAt(r2, 2), 0L))
      .unionByName(lrow("strip_spans",
        longAt(r3, 0), 0L, longAt(r3, 1), longAt(r3, 2), longAt(r3, 3)))
      .unionByName(lrow("near_dedup",
        longAt(r4, 0), longAt(rM, 0), longAt(r4, 1), longAt(r4, 2), 0L))
      .unionByName(fDecon)
      .unionByName(lrow("mix",
        longAt(r6, 0), 0L, longAt(r6, 1), longAt(r6, 2), 0L))
      .unionByName(fSplit)
      .unionByName(fPack)
  }

  val q244CurationPipelineSql: String = {
    val w = DedupQueries.SpanWidth
    val mixCases = mixTargets.toSeq.sortBy(_._1)
      .map { case (s, f) => s"WHEN '$s' THEN $f" }.mkString(" ")
    val thrs = TrainingMix.splitThresholds(splitFracs)
    val splitCases = thrs.init
      .map { case (name, thr) => s"WHEN u < $thr THEN '$name'" }
      .mkString(" ")
    // MATERIALIZED on every multiply-consumed stage: DuckDB's default CTE
    // inlining would otherwise re-expand the whole upstream chain into
    // each consumer (the q231/q201 pathology)
    s"""WITH RECURSIVE d0 AS MATERIALIZED (
       |  SELECT doc_id, source, text,
       |    CAST(len(list_filter(toks, x -> x <> '')) AS BIGINT) AS n_tok0,
       |    ${OracleFragments.qualityExpr} AS quality
       |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS toks
       |        FROM documents WHERE doc_id >= 50)),
       |med AS (SELECT source, quantile_cont(quality, 0.5) AS m
       |        FROM d0 GROUP BY source),
       |s1 AS MATERIALIZED (
       |  SELECT d0.doc_id, d0.source, d0.text, d0.n_tok0
       |  FROM d0 JOIN med USING (source) WHERE d0.quality >= med.m),
       |reps AS (SELECT MIN(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
       |s2 AS MATERIALIZED (SELECT s1.* FROM s1 JOIN reps USING (doc_id)),
       |t AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM s2),
       |grams AS MATERIALIZED (
       |  SELECT doc_id, pos, md5(array_to_string(toks[pos:pos + ${w - 1}], ' ')) AS g
       |  FROM (
       |    SELECT doc_id, toks,
       |      unnest(generate_series(1, len(toks) - ${w - 1})) AS pos
       |    FROM t WHERE len(toks) >= $w)),
       |dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1),
       |cov AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, p FROM (
       |    SELECT doc_id, unnest(generate_series(pos, pos + ${w - 1})) AS p
       |    FROM grams WHERE g IN (SELECT g FROM dup))),
       |toksp AS (
       |  SELECT doc_id, unnest(toks) AS tok,
       |    CAST(generate_subscripts(toks, 1) AS INT) AS pos
       |  FROM t WHERE len(toks) >= 1),
       |kept AS (
       |  SELECT tp.doc_id, tp.tok, tp.pos
       |  FROM toksp tp LEFT JOIN cov c ON c.doc_id = tp.doc_id AND c.p = tp.pos
       |  WHERE c.doc_id IS NULL),
       |s3 AS MATERIALIZED (
       |  SELECT b.doc_id, s2.source,
       |    b.clean_text, b.n_tok - b.n_removed AS clean_tok, b.n_removed
       |  FROM (
       |    SELECT l.doc_id, COALESCE(k.clean_text, '') AS clean_text,
       |      l.n_tok, CAST(COALESCE(cv.n_removed, 0) AS BIGINT) AS n_removed
       |    FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM t
       |          WHERE len(toks) >= 1) l
       |    LEFT JOIN (
       |      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
       |      FROM kept GROUP BY doc_id) k USING (doc_id)
       |    LEFT JOIN (
       |      SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id) cv
       |      USING (doc_id)) b
       |  JOIN s2 USING (doc_id)
       |  WHERE b.n_tok - b.n_removed >= 1),
       |s3t AS (SELECT doc_id, clean_text AS text FROM s3),
       |${OracleFragments.minhashSigCtes("s3t", p = "n")},
       |nsigm AS MATERIALIZED (SELECT * FROM nsig),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM nsigm a
       |  JOIN nsigm b ON a.seed = b.seed AND a.mh = b.mh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) / 8.0 >= 0.5),
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM cand
       |  UNION ALL
       |  SELECT id_b, id_a FROM cand),
       |reach(id, r) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id),
       |comp AS MATERIALIZED (
       |  SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS rep_id
       |  FROM reach GROUP BY id),
       |ranked AS (
       |  SELECT c.doc_id,
       |    row_number() OVER (PARTITION BY c.rep_id
       |      ORDER BY s3.clean_tok DESC, c.doc_id) AS rk
       |  FROM comp c JOIN s3 USING (doc_id)),
       |s4 AS MATERIALIZED (
       |  SELECT * FROM s3
       |  WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)),
       |bencht AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 50),
       |g5c AS (
       |  SELECT doc_id, generate_subscripts(string_split(clean_text,' '),1) AS pos,
       |         unnest(string_split(clean_text,' ')) AS tok
       |  FROM s4),
       |g5cl AS (
       |  SELECT doc_id, tok,
       |    lead(tok,1) OVER w AS l1, lead(tok,2) OVER w AS l2,
       |    lead(tok,3) OVER w AS l3, lead(tok,4) OVER w AS l4
       |  FROM g5c WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |g5cs AS (
       |  SELECT DISTINCT doc_id, tok||' '||l1||' '||l2||' '||l3||' '||l4 AS sh
       |  FROM g5cl WHERE l4 IS NOT NULL),
       |g5b AS (
       |  SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
       |         unnest(string_split(text,' ')) AS tok
       |  FROM bencht),
       |g5bl AS (
       |  SELECT doc_id, tok,
       |    lead(tok,1) OVER wb AS l1, lead(tok,2) OVER wb AS l2,
       |    lead(tok,3) OVER wb AS l3, lead(tok,4) OVER wb AS l4
       |  FROM g5b WINDOW wb AS (PARTITION BY doc_id ORDER BY pos)),
       |g5bs AS (
       |  SELECT DISTINCT tok||' '||l1||' '||l2||' '||l3||' '||l4 AS sh
       |  FROM g5bl WHERE l4 IS NOT NULL),
       |eids AS MATERIALIZED (
       |  SELECT DISTINCT c.doc_id FROM g5cs c JOIN g5bs b USING (sh)),
       |${OracleFragments.minhashSigCtes("bencht", p = "b")},
       |fids AS MATERIALIZED (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT n.doc_id, b.doc_id AS bid
       |    FROM nsigm n
       |    JOIN bsig b ON n.seed = b.seed AND n.mh = b.mh
       |    WHERE n.doc_id IN (SELECT doc_id FROM s4)
       |    GROUP BY 1, 2
       |    HAVING COUNT(*) / 8.0 >= 0.5)),
       |s5 AS MATERIALIZED (
       |  SELECT * FROM s4
       |  WHERE doc_id NOT IN (SELECT doc_id FROM eids)
       |    AND doc_id NOT IN (SELECT doc_id FROM fids)),
       |totals AS (SELECT source, SUM(clean_tok) AS t_str FROM s5 GROUP BY source),
       |thr AS (
       |  SELECT source,
       |    CAST(floor(least(1.0,
       |      (6000 * CASE source $mixCases ELSE 0.02 END) / t_str)
       |      * 4294967296.0) AS BIGINT) AS thr
       |  FROM totals),
       |s6 AS MATERIALIZED (
       |  SELECT s5.doc_id, s5.source, s5.clean_tok
       |  FROM s5 JOIN thr USING (source)
       |  WHERE ${hex8Sql("doc_id::VARCHAR || '#mix'")} < thr),
       |labeled AS MATERIALIZED (
       |  SELECT doc_id, source, clean_tok, grp,
       |    CASE $splitCases ELSE '${thrs.last._1}' END AS split
       |  FROM (
       |    SELECT s6.*, COALESCE(comp.rep_id, s6.doc_id) AS grp,
       |      ${hex8Sql("COALESCE(comp.rep_id, s6.doc_id)::VARCHAR || '#split'")} AS u
       |    FROM s6 LEFT JOIN comp USING (doc_id))),
       |packed AS (
       |  SELECT doc_id, tokens, shard,
       |    (cum - tokens) // 1024 AS seq, cum - tokens AS tok_start
       |  FROM (
       |    SELECT doc_id, tokens, shard,
       |      CAST(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |    FROM (
       |      SELECT l.doc_id,
       |        CAST(len(string_split(s5.clean_text, ' ')) AS BIGINT) AS tokens,
       |        ${hex8Sql("l.doc_id::VARCHAR || '#shard'")} % 8 AS shard
       |      FROM labeled l JOIN s5 USING (doc_id)
       |      WHERE l.split = 'train')))
       |SELECT 'input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(0 AS BIGINT) AS n_groups,
       |  CAST(COALESCE(SUM(n_tok0), 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS id_sum,
       |  CAST(0 AS BIGINT) AS aux
       |FROM d0
       |UNION ALL
       |SELECT 'quality', CAST(COUNT(*) AS BIGINT), 0,
       |  CAST(COALESCE(SUM(n_tok0), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT), 0
       |FROM s1
       |UNION ALL
       |SELECT 'exact_dedup', CAST(COUNT(*) AS BIGINT), 0,
       |  CAST(COALESCE(SUM(n_tok0), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT), 0
       |FROM s2
       |UNION ALL
       |SELECT 'strip_spans', CAST(COUNT(*) AS BIGINT), 0,
       |  CAST(COALESCE(SUM(clean_tok), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(n_removed), 0) AS BIGINT)
       |FROM s3
       |UNION ALL
       |SELECT 'near_dedup', CAST(COUNT(*) AS BIGINT),
       |  (SELECT CAST(COUNT(DISTINCT rep_id) AS BIGINT) FROM comp),
       |  CAST(COALESCE(SUM(clean_tok), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT), 0
       |FROM s4
       |UNION ALL
       |SELECT 'decontam', CAST(COUNT(*) AS BIGINT),
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fids
       |   WHERE doc_id NOT IN (SELECT doc_id FROM eids)),
       |  CAST(COALESCE(SUM(clean_tok), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT),
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM eids)
       |FROM s5
       |UNION ALL
       |SELECT 'mix', CAST(COUNT(*) AS BIGINT), 0,
       |  CAST(COALESCE(SUM(clean_tok), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT), 0
       |FROM s6
       |UNION ALL
       |SELECT 'split_' || split, CAST(COUNT(*) AS BIGINT),
       |  CAST(COUNT(DISTINCT grp) AS BIGINT),
       |  CAST(COALESCE(SUM(clean_tok), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT), 0
       |FROM labeled GROUP BY split
       |UNION ALL
       |SELECT 'pack', CAST(COUNT(*) AS BIGINT),
       |  CAST(COUNT(DISTINCT shard * 1000000 + seq) AS BIGINT),
       |  CAST(COALESCE(SUM(tokens), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT),
       |  CAST(COALESCE(SUM(tok_start), 0) AS BIGINT)
       |FROM packed""".stripMargin
  }

  /** q249: post-split leakage AUDIT — the adversarial verification of
    * [[q155LeakFreeSplit]]'s guarantee, run as its own gate. q155
    * certifies the split by construction (group-keyed assignment); this
    * gate re-measures the property from the OUTPUT, the way an auditor
    * who distrusts the pipeline would: rebuild the near-dup candidate
    * pairs over the raw corpus and count, for every split pair, the
    * candidates that straddle it. The cross-split rows must report
    * ZERO near-dup pairs — a single straddler is a paraphrase of test
    * data inside train. Beside the invariant, the gate quantifies the
    * leakage the split rule does NOT promise to remove: distinct
    * 5-gram types shared across split pairs (phrase-level overlap that
    * survives any family-keyed split of a natural corpus), so the
    * dashboard shows both "the guarantee holds" and "what residual
    * overlap remains" in one table.
    *
    * Scale: the candidate join and the CC reuse their certified
    * shapes; the gram audit collapses each doc's distinct 5-grams to
    * md5-hex8 ints (per-row kernel), dedups per split, and self-joins
    * on the int — shuffle mass is (splits × distinct grams) ints, pair
    * fan-out ≤ splits² per gram. Nothing doc-pair-shaped exists
    * outside the ≥0.5-Jaccard candidate set. */
  def q249SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Dedup
    val d = Tables.documents(spark, dir)
    // ONE signature pass serves both roles: the same candidate set
    // keys the split (via its components) AND is the set the audit
    // re-checks for straddlers — recomputing it per consumer doubled
    // the gate's shingle+md5 mass for identical rows
    val cand = Dedup.minhashCandidates(
        Tables.spread(d), "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    val clusters = Dedup.connectedComponents(cand)
      .select(col("id").as("doc_id"), col("rep").as("rep_id"))
    val keyed = d.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep_id"), col("doc_id")).as("grp"))
    val labeled = TrainingMix.assignSplits(keyed, "grp", splitFracs)
      .select(col("doc_id"), col("split"))
      .localCheckpoint() // consumed by the pair audit AND the gram audit
    val pairCounts = cand
      .join(labeled.select(col("doc_id").as("id_a"), col("split").as("sa")),
        Seq("id_a"))
      .join(labeled.select(col("doc_id").as("id_b"), col("split").as("sb")),
        Seq("id_b"))
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_neardup_pairs"))
    // spread the corpus side of the gram audit: labeled is tiny, so the
    // join broadcasts it and the 5-gram shingle + md5 kernel (the gate's
    // heaviest per-row work) would otherwise run on the single scan task
    // (r19 profile)
    val grams = Tables.spread(d).join(labeled, Seq("doc_id"))
      .select(col("split"),
        explode(graft.functions.TextFunctions.distinct_shingles(col("text"), 5))
          .as("g"))
      .select(col("split"), TrainingMix.hex8(col("g")).as("h"))
      .distinct()
    val shared = grams.select(col("split").as("sa"), col("h"))
      .join(grams.select(col("split").as("sb"), col("h")), Seq("h"))
      .filter(col("sa") <= col("sb"))
      .groupBy(col("sa").as("split_a"), col("sb").as("split_b"))
      .agg(count(lit(1)).as("n_shared_5grams"))
    val splits = labeled.select(col("split")).distinct()
    val grid = splits.select(col("split").as("sa"))
      .crossJoin(splits.select(col("split").as("sb")))
      .filter(col("sa") <= col("sb"))
      .select(col("sa").as("split_a"), col("sb").as("split_b"))
    grid
      .join(pairCounts, Seq("split_a", "split_b"), "left")
      .join(shared, Seq("split_a", "split_b"), "left")
      .select(col("split_a"), col("split_b"),
        coalesce(col("n_neardup_pairs"), lit(0L)).as("n_neardup_pairs"),
        coalesce(col("n_shared_5grams"), lit(0L)).as("n_shared_5grams"),
        (col("split_a") =!= col("split_b")).as("is_cross"))
  }

  val q249SplitLeakageSql: String = {
    val thrs = TrainingMix.splitThresholds(splitFracs)
    val cases = thrs.init
      .map { case (name, thr) => s"WHEN u < $thr THEN '$name'" }
      .mkString(" ")
    s"""WITH RECURSIVE ${OracleFragments.minhashSigCtes("documents")},
      |cand AS (
      |  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b
      |  FROM sig s1
      |  JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) / 8.0 >= 0.5),
      |sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM cand
      |  UNION ALL
      |  SELECT id_b, id_a FROM cand),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id),
      |clusters AS (
      |  SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS rep_id
      |  FROM reach GROUP BY id),
      |keyed AS (
      |  SELECT d.doc_id, COALESCE(c.rep_id, d.doc_id) AS grp
      |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id),
      |labeled AS (
      |  SELECT doc_id,
      |    CASE $cases ELSE '${thrs.last._1}' END AS split
      |  FROM (SELECT doc_id,
      |          ${hex8Sql("grp::VARCHAR || '#split'")} AS u
      |        FROM keyed)),
      |pairc AS (
      |  SELECT least(la.split, lb.split) AS split_a,
      |    greatest(la.split, lb.split) AS split_b,
      |    COUNT(*) AS n_neardup_pairs
      |  FROM cand c
      |  JOIN labeled la ON la.doc_id = c.id_a
      |  JOIN labeled lb ON lb.doc_id = c.id_b
      |  GROUP BY 1, 2),
      |g0 AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(generate_series(1, len(t) - 4),
      |        i -> array_to_string(t[i:i+4], ' '))) AS sh
      |    FROM (SELECT doc_id, string_split(text, ' ') AS t
      |          FROM documents))),
      |grams AS (
      |  SELECT DISTINCT l.split, ${hex8Sql("sh")} AS h
      |  FROM g0 JOIN labeled l USING (doc_id)),
      |shared AS (
      |  SELECT a.split AS split_a, b.split AS split_b,
      |    COUNT(*) AS n_shared_5grams
      |  FROM grams a JOIN grams b ON a.h = b.h AND a.split <= b.split
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT a.split AS split_a, b.split AS split_b
      |  FROM (SELECT DISTINCT split FROM labeled) a
      |  JOIN (SELECT DISTINCT split FROM labeled) b ON a.split <= b.split)
      |SELECT g.split_a, g.split_b,
      |  CAST(COALESCE(p.n_neardup_pairs, 0) AS BIGINT) AS n_neardup_pairs,
      |  CAST(COALESCE(s.n_shared_5grams, 0) AS BIGINT) AS n_shared_5grams,
      |  g.split_a <> g.split_b AS is_cross
      |FROM grid g
      |LEFT JOIN pairc p ON p.split_a = g.split_a AND p.split_b = g.split_b
      |LEFT JOIN shared s ON s.split_a = g.split_a AND s.split_b = g.split_b""".stripMargin
  }
}
