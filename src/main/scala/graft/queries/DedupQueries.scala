package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, TextOps}

/** Near-dup / fingerprint / language-quality gate queries over `documents`.
  * The MinHash and SimHash oracles replicate the exact hash construction
  * (md5-based, engine-portable) in DuckDB SQL — the SQL for SimHash is
  * generated programmatically, one conditional sum per bit.
  */
object DedupQueries {

  /** MinHash-LSH near-dup candidates: 3-word shingles, 8 md5 min-hashes,
    * pairs sharing ≥1; est_jaccard = matching fraction. */
  def q24MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    // spread: the signature kernel (2 md5/shingle) is compute-bound and
    // runs pre-shuffle — without it a single-row-group corpus scans (and
    // hashes) in one task
    Dedup.minhashCandidates(Tables.spread(Tables.documents(spark, dir)),
        "doc_id", "text")

  val q24MinhashLshSql: String =
    s"""WITH ${OracleFragments.minhashSigCtes("documents")}
      |SELECT s1.doc_id AS id_a, s2.doc_id AS id_b, COUNT(*)/8.0 AS est_jaccard
      |FROM sig s1
      |JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id
      |GROUP BY 1, 2""".stripMargin

  /** FAST-PATH (XXH64) dedup gate — estimator-agreement contract.
    *
    * [[Dedup.minhashCandidatesFast]] is the production hash family; a
    * faithful oracle is INFEASIBLE: XXH64 has no DuckDB builtin and
    * reimplementing its 4-lane avalanche in SQL would certify a SQL port
    * of xxhash, not the engine. Nor does a per-pair superset law exist to
    * gate against — both families are independent 8-seed estimators of
    * the same Jaccard, and on borderline pairs (true J ≈ threshold) they
    * legitimately disagree: measured at sf0.1, 3 of 259 md5-pairs ≥ 0.5
    * fall below 0.5 on the fast path (one to 0, a 0.65⁸ ≈ 3% event per
    * borderline pair). What IS certifiable, q70-style:
    *
    *  - `n_md5_pairs` per source — the gate-family pair counts at
    *    threshold 0.5, hash-compared against the oracle's independent
    *    replay (anchoring the baseline the fast path is judged against);
    *  - `families_agree_ok` — an IMPLEMENTATION-DIVERGENCE alarm, not a
    *    statistical theorem (no fixed fraction of the pair count can be
    *    one: the disagreement rate tracks the corpus's near-threshold
    *    pair mass, which is geometry — the original 10%-of-md5 band
    *    flipped legitimately at 10× data when src9 hit 11/61 = 18%
    *    borderline splits). Two conditions, both against the UNION pair
    *    count: total sym-diff ≤ max(4, ⌈0.5·n_union⌉) — the midpoint
    *    between measured binomial split noise (≤18% on the adversarial
    *    10× corpus, every case within one seed-vote of the gate) and
    *    the ~100% divergence a broken kernel produces (a fast path with
    *    wrong shingling finds a DISJOINT pair set) — and high-margin
    *    sym-diff (found est ≥ 6/8 yet absent from the other family)
    *    ≤ max(2, ⌈0.1·n_union⌉), measured 0 at all three SFs;
    *  - `exact_dups_ok` — every identical-text pair is found by the fast
    *    path at est = 1.0 (a THEOREM: identical text ⇒ identical shingle
    *    hash array ⇒ identical per-seed minima — holds in any hash
    *    family, vacuously true on corpora without exact dups).
    *
    * Pairs are attributed to the source of their lower-id endpoint, so
    * both engines group identically. */
  def q74FastAgreement(spark: SparkSession, dir: String): DataFrame = {
    // both hash families, the source map, and the exact-dup check each
    // scan the spread corpus; an eager persist barrier (the q47 pattern)
    // builds it once instead of four times — the text column dominates
    // the scan bytes, so the rescans were the query's largest cost
    val docs = Tables.spread(Tables.documents(spark, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val gatePairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard").as("est_m"))
    // consumed twice (threshold filter + exact-dup anti-join); without a
    // barrier the whole fast-path signature pipeline runs twice
    val fastAll = Dedup.minhashCandidatesFast(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fastAll.count()
    val fast = fastAll.filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard").as("est_f"))
    val sym = gatePairs.join(fast, Seq("id_a", "id_b"), "full_outer")
    val src = docs.select(col("doc_id").as("id_a"), col("source"))
    val oneSided = col("est_m").isNull || col("est_f").isNull
    val agg = sym.join(src, Seq("id_a"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_union"),
        sum(when(col("est_m").isNotNull, 1L).otherwise(0L)).as("n_md5_pairs"),
        sum(when(oneSided, 1L).otherwise(0L)).as("n_disagree"),
        // one-sided AND confidently above the gate: est ≥ 6/8 (the .626
        // cut sits between the 5/8 and 6/8 vote levels)
        sum(when(oneSided && coalesce(col("est_m"), col("est_f")) > 0.626,
          1L).otherwise(0L)).as("n_disagree_high"))
    // exact-text dup pairs the fast path MUST find at est 1.0 (theorem)
    val t = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val exactPairs = t.select(col("doc_id").as("id_a"), col("h"))
      .join(t.select(col("doc_id").as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val exactMissed = exactPairs
      .join(fastAll.filter(col("est_jaccard") === 1.0)
        .select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_anti")
      .join(src, Seq("id_a"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_missed"))
    docs.select(col("source")).distinct()
      .join(agg, Seq("source"), "left")
      .join(exactMissed, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_md5_pairs"), lit(0L)).as("n_md5_pairs"),
        ((coalesce(col("n_disagree"), lit(0L)) <=
          greatest(lit(4L), ceil(coalesce(col("n_union"), lit(0L)) * 0.5)
            .cast("long"))) &&
         (coalesce(col("n_disagree_high"), lit(0L)) <=
          greatest(lit(2L), ceil(coalesce(col("n_union"), lit(0L)) * 0.1)
            .cast("long")))).as("families_agree_ok"),
        (coalesce(col("n_missed"), lit(0L)) === 0L).as("exact_dups_ok"))
  }

  val q74FastAgreementSql: String =
    s"""WITH ${OracleFragments.minhashSigCtes("documents")},
      |pairs AS (
      |  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b
      |  FROM sig s1
      |  JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) / 8.0 >= 0.5),
      |psrc AS (
      |  SELECT d.source, COUNT(*) AS n
      |  FROM pairs p JOIN documents d ON d.doc_id = p.id_a
      |  GROUP BY d.source)
      |SELECT s.source, COALESCE(psrc.n, 0) AS n_md5_pairs,
      |  TRUE AS families_agree_ok, TRUE AS exact_dups_ok
      |FROM (SELECT DISTINCT source FROM documents) s
      |LEFT JOIN psrc USING (source)""".stripMargin

  /** SimHash fingerprints, 60 bits, md5-nibble token hash (portable);
    * native per-row kernel, declarative form cross-checked in DedupSpec. */
  def q25Simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashMd5(Tables.documents(spark, dir), "doc_id", "text", bits = 60)
      .withColumnRenamed("id", "doc_id")

  /** The 60-bit md5 SimHash as CTEs ending in `ssig(doc_id, simhash)` —
    * shared by the q25 signature gate and the q105 near-dup gate. */
  private def simhashSigCtes: String = {
    val bitSums = (0 until 60).map { b =>
      val p = b / 4 + 1; val w = b % 4
      s"SUM(CASE WHEN (((strpos('0123456789abcdef', substr(h, $p, 1)) - 1) >> $w) & 1) = 1 THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n    ")
    val sig = (0 until 60).map { b =>
      s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, md5(t) AS h FROM (
       |    SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents)),
       |sums AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM tok GROUP BY doc_id),
       |ssig AS (SELECT doc_id, $sig AS simhash FROM sums)""".stripMargin
  }

  val q25SimhashSql: String =
    s"""WITH $simhashSigCtes
       |SELECT doc_id, simhash FROM ssig""".stripMargin

  /** Order-sensitive rolling-hash fingerprint, md5-portable token hash;
    * the oracle reproduces the fold with nested `list_reduce`. */
  def q26Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
        TextOps.fingerprintMd5(TextOps.tokenize(col("text"))).as("fingerprint"))
  }

  val q26FingerprintSql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_transform(string_split(text, ' '),
      |      t -> list_reduce(list_concat([CAST(0 AS BIGINT)],
      |             list_transform(generate_series(1, 8),
      |               i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT))),
      |           (a, b) -> a * 16 + b) % 2147483647) AS hs
      |  FROM documents)
      |SELECT doc_id,
      |  list_reduce(list_concat([CAST(0 AS BIGINT)], hs),
      |    (a, b) -> (a * 1000003 + b) % 2147483647) AS fingerprint
      |FROM h""".stripMargin

  /** Language ID (stopword-profile argmax) + composite quality score. */
  def q27LangQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val en = TextOps.langProfiles.head._2
    d.select(col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("pred_lang"),
        TextOps.qualityScore(col("text"), en).as("quality"))
  }

  val q27LangQualitySql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang, text,
       |    ${OracleFragments.langScoreCols},
       |    string_split(text, ' ') AS toks
       |  FROM documents)
       |SELECT doc_id, lang,
       |  ${OracleFragments.langPredCase} AS pred_lang,
       |  ${OracleFragments.qualityExpr} AS quality
       |FROM scored""".stripMargin

  /** Per-source quality-percentile gate — the "filter each domain to its
    * better half" curation op: score every doc with the native quality
    * kernel, compute each source's median score (exact interpolated
    * percentile, the q32-gated machinery), keep docs at or above their
    * OWN source's median. Per-source (not global) thresholds matter at
    * 100 TB: a boilerplate-heavy domain would otherwise be entirely
    * dropped or entirely kept. One scan + one 20-row broadcast join;
    * quality values are exact quarters and the interpolated median of
    * quarters is an exact binary fraction, so the >= compare is
    * bit-deterministic cross-engine. */
  def q67QualityGate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val en = TextOps.langProfiles.head._2
    val scored = d.select(col("doc_id"), col("source"),
      TextOps.qualityScore(col("text"), en).as("quality"))
    val med = scored.groupBy(col("source"))
      .agg(expr("percentile(quality, 0.5)").as("source_median"))
    scored.join(broadcast(med), "source")
      .filter(col("quality") >= col("source_median"))
      .select(col("doc_id"), col("source"), col("quality"), col("source_median"))
  }

  val q67QualityGateSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    ${OracleFragments.qualityExpr} AS quality
       |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS toks
       |        FROM documents)),
       |med AS (SELECT source, quantile_cont(quality, 0.5) AS source_median
       |        FROM scored GROUP BY source)
       |SELECT s.doc_id, s.source, s.quality, m.source_median
       |FROM scored s JOIN med m USING (source)
       |WHERE s.quality >= m.source_median""".stripMargin

  /** Incremental dedup against a PERSISTED signature index (the cross-run
    * operating mode at 100 TB — [[Dedup.signatureIndexArtifact]]): the
    * corpus is split at the median doc_id into an "already-ingested"
    * half whose signatures live in a stored parquet index, and a "new
    * batch" half that is deduped against index ∪ itself without ever
    * re-shingling the first half. Output = every candidate pair with at
    * least one new-batch endpoint. The oracle recomputes ALL signatures
    * from scratch and filters pairs to id_b ≥ split (id_b is the greater
    * endpoint, so that predicate is exactly "≥1 new endpoint") —
    * certifying that the incremental path loses nothing vs a full
    * recompute. The index artifact is keyed by source len+mtime; first
    * run builds it, reruns serve from parquet. */
  def q68IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    // one 2-value scalar to the driver: the split must also key the
    // artifact path, so it cannot stay lazy
    val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val split = (r.getLong(0) + r.getLong(1)) / 2
    val index = Dedup.signatureIndexArtifact(
      docs.filter(col("doc_id") < split), "doc_id", "text",
      sigIndexPath(spark, dir, split))
    Dedup.minhashCandidatesIncremental(
      docs.filter(col("doc_id") >= split), "doc_id", "text", index)
  }

  /** Artifact path for q68's signature index, keyed by the source
    * parquet's length + mtime (same scheme as the q35 centroid artifact)
    * so a regenerated dataset can never serve stale signatures. */
  private def sigIndexPath(spark: SparkSession, dir: String, split: Long): String =
    graft.core.Artifacts.path(spark, s"$dir/documents.parquet",
      s"sigidx_mh8_w3_s$split")

  val q68IncrementalDedupSql: String =
    s"""WITH ${OracleFragments.minhashSigCtes("documents")},
      |split AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS v FROM documents)
      |SELECT s1.doc_id AS id_a, s2.doc_id AS id_b, COUNT(*)/8.0 AS est_jaccard
      |FROM sig s1
      |JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id
      |WHERE s2.doc_id >= (SELECT v FROM split)
      |GROUP BY 1, 2""".stripMargin

  /** Full connected components over the MinHash candidate graph
    * (est_jaccard ≥ 0.5): every doc in a qualifying pair labeled with its
    * component's min id — [[Dedup.connectedComponents]]'s iterative
    * min-label propagation, judged against a `WITH RECURSIVE` transitive-
    * closure oracle (an INDEPENDENT algorithm: BFS reachability fixpoint
    * vs distributed label propagation — both must land on the same
    * partition of the graph). */
  def q62DedupGroups(spark: SparkSession, dir: String): DataFrame = {
    val cand = Dedup.minhashCandidates(
        Tables.spread(Tables.documents(spark, dir)), "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(cand)
      .select(col("id").as("doc_id"), col("rep").as("rep_id"))
  }

  val q62DedupGroupsSql: String =
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
      |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id)
      |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS rep_id
      |FROM reach GROUP BY id""".stripMargin

  /** Dedup-aware training weights: every document weighted 1/|near-dup
    * cluster| (singletons = 1) — the soft alternative to dropping
    * duplicates outright (repeated content contributes ONE document's
    * worth of gradient in aggregate, preserving coverage while killing
    * memorization pressure). Clusters from the q62 CC over MinHash
    * candidates; the weight join adds one count + one co-partitioned join
    * on the representative key. */
  def q124DedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cand = Dedup.minhashCandidates(Tables.spread(docs), "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    val comp = Dedup.connectedComponents(cand)
      .select(col("id").as("doc_id"), col("rep").as("rep_id"))
    val full = docs.select(col("doc_id")).join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep_id"), col("doc_id")).as("rep_id"))
    val sizes = full.groupBy(col("rep_id")).agg(count(lit(1)).as("csize"))
    full.join(sizes, Seq("rep_id"))
      .select(col("doc_id"), col("rep_id"), col("csize"),
        round(lit(1e6) / col("csize")).cast("long").as("weight_fp6"))
  }

  val q124DedupWeightsSql: String =
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
      |comp AS (SELECT id AS doc_id, MIN(r) AS rep_id FROM reach GROUP BY id),
      |full_docs AS (
      |  SELECT d.doc_id, COALESCE(c.rep_id, d.doc_id) AS rep_id
      |  FROM documents d LEFT JOIN comp c USING (doc_id)),
      |sizes AS (SELECT rep_id, COUNT(*) AS csize FROM full_docs GROUP BY rep_id)
      |SELECT f.doc_id, CAST(f.rep_id AS BIGINT) AS rep_id,
      |  CAST(s.csize AS BIGINT) AS csize,
      |  CAST(round(1e6 / s.csize) AS BIGINT) AS weight_fp6
      |FROM full_docs f JOIN sizes s USING (rep_id)""".stripMargin

  /** Canonical-selection gate ([[graft.ops.Dedup.canonicalByScore]]):
    * q62's duplicate components re-labeled under the keep-longest policy
    * (score = token count, the "most complete version" proxy; tie-break
    * min id). The oracle extends q62's recursive closure with the same
    * argmax. */
  def q88CanonicalPick(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cand = Dedup.minhashCandidates(Tables.spread(docs), "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    val members = Dedup.connectedComponents(cand)
    val attrs = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("n_tok"))
    Dedup.canonicalByScore(members, attrs, "doc_id", "n_tok")
      .select(col("id").as("doc_id"), col("rep").as("rep_id"),
        col("canon_id"), col("keep"))
  }

  val q88CanonicalPickSql: String =
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
      |comp AS (
      |  SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS rep_id
      |  FROM reach GROUP BY id),
      |tlens AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |ranked AS (
      |  SELECT c.doc_id, c.rep_id,
      |    row_number() OVER (PARTITION BY c.rep_id
      |      ORDER BY t.n_tok DESC, c.doc_id) AS rk
      |  FROM comp c JOIN tlens t USING (doc_id)),
      |canon AS (SELECT rep_id, doc_id AS canon_id FROM ranked WHERE rk = 1)
      |SELECT c.doc_id, c.rep_id, canon.canon_id,
      |  (c.doc_id = canon.canon_id) AS keep
      |FROM comp c JOIN canon USING (rep_id)""".stripMargin

  /** Duplicated-span coverage gate ([[graft.ops.SpanDedup]]): per-doc
    * fraction of token positions covered by an 8-token window occurring
    * verbatim anywhere else in the corpus — the ExactSubstr criterion
    * (Lee et al. 2021) at gate-able width. The oracle rebuilds the md5
    * gram keys from the same 1-based slices. */
  val SpanWidth = 8

  def q79DupSpans(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.ops.SpanDedup.dupSpanCoverage(
      graft.core.Tables.documents(spark, dir), "doc_id", "text", SpanWidth)

  val q79DupSpansSql: String = {
    val w = SpanWidth
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |lens AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM t
      |  WHERE len(toks) >= 1),
      |grams AS (
      |  SELECT doc_id, pos, md5(array_to_string(toks[pos:pos + ${w - 1}], ' ')) AS g
      |  FROM (
      |    SELECT doc_id, toks,
      |      unnest(generate_series(1, len(toks) - ${w - 1})) AS pos
      |    FROM t WHERE len(toks) >= $w)),
      |dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1),
      |cov AS (
      |  SELECT doc_id, COUNT(DISTINCT p) AS covered FROM (
      |    SELECT doc_id, unnest(generate_series(pos, pos + ${w - 1})) AS p
      |    FROM grams WHERE g IN (SELECT g FROM dup))
      |  GROUP BY doc_id)
      |SELECT l.doc_id, l.n_tok,
      |  CAST(coalesce(c.covered, 0) AS BIGINT) AS covered,
      |  CAST(coalesce(c.covered, 0) AS DOUBLE) / l.n_tok AS dup_frac
      |FROM lens l LEFT JOIN cov c USING (doc_id)""".stripMargin
  }

  /** Duplicated-span REMOVAL gate ([[graft.ops.SpanDedup.removeDupSpans]]):
    * the CLEAN side of q79 — tokens under any duplicated window are
    * stripped and the doc is rebuilt from the survivors. The oracle
    * replays the plain md5-gram construction and the string_agg rebuild,
    * certifying the pruned rolling-key plan as a rewrite identity (the
    * q86/q79 discipline). */
  def q93StripSpans(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.ops.SpanDedup.removeDupSpans(
      graft.core.Tables.documents(spark, dir), "doc_id", "text", SpanWidth)

  val q93StripSpansSql: String = {
    val w = SpanWidth
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, pos, md5(array_to_string(toks[pos:pos + ${w - 1}], ' ')) AS g
      |  FROM (
      |    SELECT doc_id, toks,
      |      unnest(generate_series(1, len(toks) - ${w - 1})) AS pos
      |    FROM t WHERE len(toks) >= $w)),
      |dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1),
      |cov AS (
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
      |  WHERE c.doc_id IS NULL)
      |SELECT l.doc_id,
      |  COALESCE(k.clean_text, '') AS clean_text,
      |  l.n_tok,
      |  CAST(COALESCE(cv.n_removed, 0) AS BIGINT) AS n_removed
      |FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM t
      |      WHERE len(toks) >= 1) l
      |LEFT JOIN (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      |  FROM kept GROUP BY doc_id) k USING (doc_id)
      |LEFT JOIN (
      |  SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id) cv
      |  USING (doc_id)""".stripMargin
  }

  /** Bloom-pruned ingest anti-join gate ([[graft.ops.Bloom.prunedAntiJoin]]):
    * "batch" = every 5th document, "corpus" = documents off the 3-grid,
    * keyed by content hash — overlap is partial, so the gate exercises
    * both admitted and rejected rows. The oracle runs the PLAIN anti-join:
    * Bloom pruning has no false negatives, so the rewrite must hash-match
    * it exactly (the q72 salting discipline applied to runtime filtering). */
  def q86BloomAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.core.Tables.documents(spark, dir)
    val corpus = d.filter(col("doc_id") % 3 =!= 0)
      .select(md5(col("text")).as("k"))
    val batch = d.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), md5(col("text")).as("k"))
    // size the filter from the corpus, not a pinned literal (the q73
    // autoBits lesson): a static hint under-sizes the filter as data
    // grows, degrading fpp until pruning stops pruning — correctness
    // holds either way, but the operator's point is the pruning. The
    // count is a metadata-only parquet pass (no text bytes read).
    val expected = d.count() / 5 + 1
    graft.ops.Bloom.prunedAntiJoin(batch, corpus, "k",
      expectedItems = expected, fpp = 0.01)
  }

  val q86BloomAntiJoinSql: String =
    """WITH corpus AS (
      |  SELECT md5(text) AS k FROM documents WHERE doc_id % 3 <> 0),
      |batch AS (
      |  SELECT doc_id, md5(text) AS k FROM documents WHERE doc_id % 5 = 0)
      |SELECT b.k, b.doc_id FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.k = b.k)""".stripMargin

  /** q105: SimHash Hamming near-dup ([[Dedup.simhashNearDup]]) — 60-bit
    * signatures, 4 bands of 15 bits, verified pairs at Hamming ≤ 3. The
    * pigeonhole band guarantee makes the bucket join exact for this
    * radius; the oracle rebuilds signatures, bands, and the bit_count
    * verify arithmetically. */
  def q105SimhashNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(Tables.documents(spark, dir), "doc_id", "text",
        bits = 60, bands = 4, maxHamming = 3)
      .withColumnRenamed("id_a", "doc_a")
      .withColumnRenamed("id_b", "doc_b")

  /** q108: cross-source duplication matrix — for every source pair, how
    * many DOC PAIRS share the same leading 8-token prefix across them
    * (and within-source pairs on the diagonal): the provenance diagnostic
    * that tells a curation team WHICH feeds re-crawl or template each
    * other. The prefix fingerprint (rather than whole-content md5) also
    * catches shared boilerplate heads ahead of exact duplication. One
    * hash shuffle (fingerprint → per-source counts); pair counts are then
    * c_a·c_b / C(c,2) arithmetic on the tiny (hash, source) aggregate —
    * the corpus is never self-joined. */
  def q108CrossSourceDup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val perSrc = d.groupBy(
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))).as("h"),
        col("source"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cross = perSrc.as("a")
      .join(perSrc.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(sum(col("a.c") * col("b.c")).as("n_pairs"))
    val within = perSrc.filter(col("c") >= 2)
      .groupBy(col("source").as("source_a"))
      .agg(sum(expr("c * (c - 1) div 2")).as("n_pairs"))
      .select(col("source_a"), col("source_a").as("source_b"), col("n_pairs"))
    cross.unionByName(within)
  }

  val q108CrossSourceDupSql: String =
    """WITH perSrc AS (
      |  SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h,
      |    source, COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |cross_pairs AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(SUM(a.c * b.c) AS BIGINT) AS n_pairs
      |  FROM perSrc a JOIN perSrc b
      |    ON a.h = b.h AND a.source < b.source
      |  GROUP BY 1, 2),
      |within AS (
      |  SELECT source AS source_a, source AS source_b,
      |    CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_pairs
      |  FROM perSrc WHERE c >= 2 GROUP BY source)
      |SELECT * FROM cross_pairs UNION ALL SELECT * FROM within""".stripMargin

  val q105SimhashNearDupSql: String =
    s"""WITH $simhashSigCtes,
       |bands AS (
       |  SELECT doc_id, simhash, unnest(range(0, 4)) AS b FROM ssig),
       |keyed AS (
       |  SELECT doc_id, simhash, b,
       |    (simhash >> CAST(b * 15 AS INT)) & 32767 AS key FROM bands),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM keyed a JOIN keyed b
       |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin

  /** Shingle containment over MinHash candidates ([[Dedup.verifyContainment]]):
    * the asymmetric near-subset detector — candidates from the q24 md5
    * family at est ≥ 0.5, then exact |A∩B|/|A| and /|B| over distinct
    * 3-shingle sets. The oracle replays candidates AND the exact set
    * intersection. */
  def q119Containment(spark: SparkSession, dir: String): DataFrame = {
    // spread: both the signature kernel (2 md5/shingle) and the exact
    // containment verify re-shingle from this frame — on the single-row-
    // group corpus both ran on ONE scan task (profiled r19: 1.2 s serial)
    val d = Tables.spread(Tables.documents(spark, dir))
    val cand = Dedup.minhashCandidates(d, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    Dedup.verifyContainment(d, cand, "doc_id", "text")
  }

  val q119ContainmentSql: String =
    s"""WITH ${OracleFragments.minhashSigCtes("documents")},
      |cand AS (
      |  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b
      |  FROM sig s1
      |  JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id
      |  GROUP BY 1, 2 HAVING COUNT(*) / 8.0 >= 0.5),
      |dsh AS (SELECT DISTINCT doc_id, sh FROM shingles),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY doc_id),
      |common AS (
      |  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      |  FROM cand c
      |  JOIN dsh a ON a.doc_id = c.id_a
      |  JOIN dsh b ON b.doc_id = c.id_b AND b.sh = a.sh
      |  GROUP BY 1, 2)
      |SELECT c.id_a, c.id_b,
      |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
      |  CAST(COALESCE(cm.n_common, 0) AS BIGINT) AS n_common,
      |  CAST(COALESCE(cm.n_common, 0) AS DOUBLE) / sa.n AS cont_a,
      |  CAST(COALESCE(cm.n_common, 0) AS DOUBLE) / sb.n AS cont_b
      |FROM cand c
      |JOIN sizes sa ON sa.doc_id = c.id_a
      |JOIN sizes sb ON sb.doc_id = c.id_b
      |LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b""".stripMargin

  /** Source-level MinHash similarity matrix: one 8-seed signature per
    * SOURCE (min over the source's shingle union — computed as min-of-mins
    * over the per-doc native signatures, exploiting min's composability so
    * the corpus still signs in ONE codegen'd pass), then the est-Jaccard
    * matrix over all source pairs. Corpus-level overlap diagnostics at the
    * feed granularity: which two crawls/feeds carry near-identical
    * content. The source count is small by nature, so the pair join is a
    * few hundred rows however big the corpus. */
  def q121SourceMinhash(spark: SparkSession, dir: String): DataFrame = {
    // spread: the signature kernel (2 md5/shingle over every doc) runs
    // before the first exchange and was serial on the single-row-group
    // scan (r19)
    val d = Tables.spread(Tables.documents(spark, dir))
    val sigs = Dedup.minhashSignatures(
        d.select(col("source"), col("text")), "source", "text")
      .groupBy(col("id"), col("seed")).agg(min(col("mh")).as("mh"))
    val a = sigs.select(col("seed"), col("mh").as("mh_a"), col("id").as("source_a"))
    val b = sigs.select(col("seed"), col("mh").as("mh_b"), col("id").as("source_b"))
    a.join(b, Seq("seed"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg((sum(when(col("mh_a") === col("mh_b"), 1L).otherwise(0L))
        .cast("double") / 8).as("est_jaccard"))
  }

  val q121SourceMinhashSql: String =
    s"""WITH ${OracleFragments.minhashSigCtes("documents")},
      |ssig AS (
      |  SELECT d.source AS sid, s.seed, MIN(s.mh) AS mh
      |  FROM sig s JOIN documents d USING (doc_id)
      |  GROUP BY 1, 2)
      |SELECT a.sid AS source_a, b.sid AS source_b,
      |  CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE) / 8
      |    AS est_jaccard
      |FROM ssig a JOIN ssig b ON b.seed = a.seed AND a.sid < b.sid
      |GROUP BY 1, 2""".stripMargin

  /** Paragraph/block dedup with reconstruction ([[Dedup.blockDedup]]):
    * 16-token blocks, first corpus occurrence wins, documents rebuilt
    * from their surviving blocks. The oracle replays the block split, the
    * per-hash first-occurrence window, and the ordered re-assembly. */
  def q115ParaDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.blockDedup(Tables.documents(spark, dir), "doc_id", "text")

  val q115ParaDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |blocks AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS bi,
      |    array_to_string(ts[CAST(i * 16 + 1 AS INT) : CAST(i * 16 + 16 AS INT)], ' ') AS bt
      |  FROM (SELECT doc_id, ts,
      |          unnest(range(0, CAST(ceil(len(ts) / 16.0) AS BIGINT))) AS i
      |        FROM toks)),
      |flagged AS (
      |  SELECT doc_id, bi, bt,
      |    row_number() OVER (PARTITION BY md5(bt) ORDER BY doc_id, bi) = 1 AS keep
      |  FROM blocks)
      |SELECT doc_id,
      |  CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS kept,
      |  CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS dropped,
      |  COALESCE(string_agg(bt, ' ' ORDER BY bi) FILTER (WHERE keep), '') AS text_clean
      |FROM flagged
      |GROUP BY doc_id""".stripMargin

  /** Corpus snapshot diff — the data-versioning primitive an incremental
    * 100 TB pipeline audits re-crawls with: two deterministic snapshot
    * views of `documents` (v1 drops doc_id % 11 = 3; v2 drops
    * doc_id % 13 = 5 and revises the text of doc_id % 7 = 2) are
    * full-outer-joined on the key and compared BY CONTENT HASH, so the
    * diff shuffles 16-byte digests, never document bodies. Output:
    * added/removed/changed/unchanged counts per source. */
  def q116SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val v1 = d.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"), col("source").as("source_old"),
        md5(col("text")).as("h_old"))
    val v2 = d.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"), col("source").as("source_new"),
        md5(when(col("doc_id") % 7 === 2, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("h_new"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("source_old"), col("source_new")).as("source"),
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") =!= col("h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("cnt"))
  }

  val q116SnapshotDiffSql: String =
    """WITH v1 AS (
      |  SELECT doc_id, source AS source_old, md5(text) AS h_old
      |  FROM documents WHERE doc_id % 11 <> 3),
      |v2 AS (
      |  SELECT doc_id, source AS source_new,
      |    md5(CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END) AS h_new
      |  FROM documents WHERE doc_id % 13 <> 5)
      |SELECT COALESCE(source_old, source_new) AS source,
      |  CASE WHEN h_old IS NULL THEN 'added'
      |       WHEN h_new IS NULL THEN 'removed'
      |       WHEN h_old <> h_new THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  COUNT(*) AS cnt
      |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
      |GROUP BY 1, 2""".stripMargin

  /** q127: blocked entity resolution over the part catalog — candidate
    * pairs only within (brand, size-bucket, type-word) blocks, scored by
    * normalized Levenshtein similarity on the full name, matched at
    * ≥ 0.6. The record-linkage counterpart of document dedup: same-entity
    * listings under slightly different names. Blocking bounds pair work
    * to Σ_b n_b² (max block 9 at sf0.1 — measured); the threshold is
    * applied to the fixed-point score so no float boundary can flip a
    * row cross-engine. See [[graft.ops.EntityRes]] for the scale shape. */
  def q127EntityMatch(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(
      col("p_partkey").as("id"),
      lower(col("p_name")).as("name"),
      col("p_brand").as("brand"),
      element_at(split(lower(col("p_name")), " "), 2).as("blk_word"),
      floor(col("p_size") / 10).as("blk_size"))
    graft.ops.EntityRes.blockedMatches(
      p, "id", "name", Seq("brand", "blk_word", "blk_size"), minSim = 0.6)
  }

  val q127EntityMatchSql: String =
    """WITH recs AS (
      |  SELECT p_partkey AS id, lower(p_name) AS name, p_brand AS brand,
      |    split_part(lower(p_name), ' ', 2) AS blk_word,
      |    CAST(floor(p_size / 10) AS BIGINT) AS blk_size
      |  FROM part)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(round((1.0 - CAST(levenshtein(a.name, b.name) AS DOUBLE)
      |    / greatest(length(a.name), length(b.name))) * 1000000.0) AS BIGINT)
      |    AS sim_fp6
      |FROM recs a JOIN recs b
      |  ON a.brand = b.brand AND a.blk_word = b.blk_word
      | AND a.blk_size = b.blk_size AND a.id < b.id
      |WHERE CAST(round((1.0 - CAST(levenshtein(a.name, b.name) AS DOUBLE)
      |    / greatest(length(a.name), length(b.name))) * 1000000.0) AS BIGINT)
      |  >= 600000""".stripMargin

  /** q163: dedup threshold-sensitivity audit — how much duplication a
    * MinHash pass would remove at each candidate threshold (0.5 / 0.75 /
    * 1.0), from ONE candidate enumeration: pairs at-or-above each
    * threshold, and the distinct documents those pairs touch. This is
    * the knob-tuning table read before committing a dedup threshold —
    * the jump between rows IS the marginal aggressiveness of lowering
    * it. The threshold grid replays the same candidate table three ways
    * (grid-sized fan-out, not re-enumeration). */
  def q163ThresholdCurve(spark: SparkSession, dir: String): DataFrame = {
    val cand = Dedup.minhashCandidates(
      Tables.spread(Tables.documents(spark, dir)), "doc_id", "text")
      .select(col("id_a"), col("id_b"),
        round(col("est_jaccard") * lit(1e6)).cast("long").as("j_fp6"))
      .localCheckpoint() // three grid consumers; enumeration runs ONCE
    val thresholds = Seq(500000L, 750000L, 1000000L)
    thresholds.map { t =>
      val at = cand.filter(col("j_fp6") >= t)
      val docs = at.select(col("id_a").as("d")).unionAll(
        at.select(col("id_b").as("d"))).distinct()
      at.agg(count(lit(1)).as("n_pairs"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs_touched")))
        .select(lit(t).as("threshold_fp6"), col("n_pairs"),
          col("n_docs_touched"))
    }.reduce(_ unionByName _)
  }

  val q163ThresholdCurveSql: String =
    s"""WITH ${OracleFragments.minhashSigCtes("documents")},
      |cand AS (
      |  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b,
      |    CAST(round(COUNT(*) / 8.0 * 1000000.0) AS BIGINT) AS j_fp6
      |  FROM sig s1
      |  JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id
      |  GROUP BY 1, 2),
      |grid(threshold_fp6) AS (VALUES (500000), (750000), (1000000))
      |-- LEFT JOIN (not CROSS JOIN + FILTER): on a duplicate-free corpus
      |-- cand is empty and the cross form would emit zero rows while the
      |-- agg-with-no-groups Spark side emits one zero row per threshold;
      |-- the left form keeps every grid row alive (round-11 advisory)
      |SELECT CAST(g.threshold_fp6 AS BIGINT) AS threshold_fp6,
      |  COUNT(c.id_a) AS n_pairs,
      |  (SELECT COUNT(*) FROM (
      |     SELECT id_a AS d FROM cand WHERE j_fp6 >= g.threshold_fp6
      |     UNION
      |     SELECT id_b FROM cand WHERE j_fp6 >= g.threshold_fp6))
      |    AS n_docs_touched
      |FROM grid g LEFT JOIN cand c ON c.j_fp6 >= g.threshold_fp6
      |GROUP BY g.threshold_fp6""".stripMargin

  /** q156: cross-language duplicate audit — exact-duplicate groups
    * (md5 of the full text) bucketed by how many DISTINCT `lang` tags
    * their members carry: `n_langs > 1` rows are metadata-inconsistent
    * duplicates (the mC4-style lang-tag noise that poisons per-language
    * mixing if deduped per-language instead of globally). One md5-keyed
    * aggregate — the corpus shuffles 16-byte keys, never text. */
  def q156CrossLangDups(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("nd"), countDistinct(col("lang")).as("n_langs"))
      .filter(col("nd") > 1)
      .groupBy(col("n_langs"))
      .agg(count(lit(1)).as("n_groups"), sum(col("nd")).as("n_docs"))

  val q156CrossLangDupsSql: String =
    """WITH g AS (
      |  SELECT md5(text) AS h, COUNT(*) AS nd,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |  FROM documents GROUP BY 1)
      |SELECT n_langs, COUNT(*) AS n_groups, CAST(SUM(nd) AS BIGINT) AS n_docs
      |FROM g WHERE nd > 1 GROUP BY n_langs""".stripMargin

  /** q148: dedup savings report — the dataset-card table a curation run
    * publishes after near-dup clustering: per CLUSTER SIZE, how many
    * clusters, how many documents, total bytes, and bytes saved by
    * keeping only each cluster's canonical (min-id rep) document.
    * Singletons (docs in no q62 component) get the size-1 row, so the
    * histogram partitions the whole corpus. Downstream of the q62
    * clusters everything is cluster-sized: one doc_id join for byte
    * counts, one rep aggregate, one size-keyed histogram, one anti-join
    * for the singleton row — no new quadratic surface. */
  def q148DupSavings(spark: SparkSession, dir: String): DataFrame = {
    val clusters = q62DedupGroups(spark, dir)
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val per = clusters.join(d, "doc_id")
      .groupBy(col("rep_id"))
      .agg(count(lit(1)).as("sz"), sum(col("n_chars")).as("bt"),
        sum(when(col("doc_id") === col("rep_id"), col("n_chars"))
          .otherwise(lit(0L))).as("rep_bytes"))
    val hist = per.groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"),
        sum(col("bt")).as("bytes_total"),
        sum(col("bt") - col("rep_bytes")).as("bytes_saved"))
    val singles = d.join(clusters, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_clusters"),
        coalesce(sum(col("n_chars")), lit(0L)).as("bytes_total"))
      .select(lit(1L).as("cluster_size"), col("n_clusters"),
        col("n_clusters").as("n_docs"), col("bytes_total"),
        lit(0L).as("bytes_saved"))
    hist.unionByName(singles)
  }

  val q148DupSavingsSql: String =
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
      |per AS (
      |  SELECT c.rep_id, COUNT(*) AS sz, CAST(SUM(d.n_chars) AS BIGINT) AS bt,
      |    CAST(SUM(CASE WHEN c.doc_id = c.rep_id THEN d.n_chars ELSE 0 END)
      |      AS BIGINT) AS rep_bytes
      |  FROM clusters c JOIN documents d USING (doc_id) GROUP BY 1),
      |hist AS (
      |  SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
      |    CAST(SUM(sz) AS BIGINT) AS n_docs,
      |    CAST(SUM(bt) AS BIGINT) AS bytes_total,
      |    CAST(SUM(bt - rep_bytes) AS BIGINT) AS bytes_saved
      |  FROM per GROUP BY 1),
      |singles AS (
      |  SELECT CAST(1 AS BIGINT) AS cluster_size, COUNT(*) AS n_clusters,
      |    COUNT(*) AS n_docs,
      |    CAST(COALESCE(SUM(d.n_chars), 0) AS BIGINT) AS bytes_total,
      |    CAST(0 AS BIGINT) AS bytes_saved
      |  FROM documents d
      |  WHERE NOT EXISTS (SELECT 1 FROM clusters c WHERE c.doc_id = d.doc_id))
      |SELECT * FROM hist UNION ALL SELECT * FROM singles""".stripMargin

  /** q172: blocked edit-distance fuzzy join — the record-linkage
    * workhorse (Levenshtein ≤ 8 over 32-char title prefixes) with the
    * standard TWO-KEY blocking scheme: candidates must share the title's
    * first 8 OR last 8 characters, so a single edit burst at either end
    * cannot hide a match from both blocks, and the join never goes
    * all-pairs — pair volume is Σ block² over hash-sized blocks, the
    * same bucketing argument as MinHash bands. The edit distance itself
    * runs only on candidate pairs (codegen'd `levenshtein`, identical DP
    * in both engines). At 100 TB the two block maps are one shuffle each
    * on an 8-byte key; skewed blocks (empty/template titles) salt the
    * same way any hot MinHash band does. */
  /** Shared candidate generator for the q172/q182 fuzzy joins: 32-char
    * title prefixes, two-key (head/tail 8-char) blocking, and the
    * standard record-linkage BLOCK-SIZE CAP — blocks larger than 256
    * members are degenerate keys (template/boilerplate text), and
    * without the cap pair volume is Σ block², which the r12 sf1 sweep
    * measured going quadratic on fixed-vocabulary corpora (8.9× time for
    * 10× data). With it, pair work is ≤ 256·n — linear — and the pairs a
    * hot block would have contributed belong to the MinHash/SimHash
    * family of gates, which handle exactly that mass without
    * enumeration. The cap is part of the certified semantics: the oracle
    * applies the identical rule, at every SF. */
  private def blockedTitlePairs(spark: SparkSession, dir: String,
      keepBlock: Boolean = false): DataFrame = {
    val t = Tables.documents(spark, dir)
      .filter(col("n_chars") >= 32)
      .select(col("doc_id"), substring(col("text"), 1, 32).as("title"))
    val blocked = t.select(col("doc_id"), col("title"),
        substring(col("title"), 1, 8).as("bk"))
      .unionByName(t.select(col("doc_id"), col("title"),
        substring(col("title"), 25, 8).as("bk")))
      // block-size cap: the count window shares the bk partitioning the
      // join needs anyway — one exchange, reused
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))))
      .filter(col("bn") <= 256).drop("bn")
    val a = blocked.select(col("bk"), col("doc_id").as("id_a"), col("title").as("ta"))
    val b = blocked.select(col("bk"), col("doc_id").as("id_b"), col("title").as("tb"))
    val base = a.join(b, Seq("bk")).filter(col("id_a") < col("id_b"))
    // keepBlock retains the blocking key as a LOCALITY column for CC
    // condensation (q205) — a pair found under both block keys then
    // keeps both rows (duplicate edges are harmless to union-find/CC;
    // the gated pair forms keep the bk-free distinct contract)
    if (keepBlock)
      base.select(col("id_a"), col("id_b"), col("ta"), col("tb"), col("bk"))
        .distinct()
    else
      base.select(col("id_a"), col("id_b"), col("ta"), col("tb")).distinct()
  }

  /** The q172/q182 shared oracle CTEs ending in
    * `cand(id_a, id_b, ta, tb)` — including the 256 block cap. */
  private val blockedTitleCtes: String =
    """t AS (
      |  SELECT doc_id, substr(text, 1, 32) AS title
      |  FROM documents WHERE n_chars >= 32),
      |blocked AS (
      |  SELECT doc_id, title, bk FROM (
      |    SELECT doc_id, title, substr(title, 1, 8) AS bk FROM t
      |    UNION ALL
      |    SELECT doc_id, title, substr(title, 25, 8) AS bk FROM t)
      |  QUALIFY COUNT(*) OVER (PARTITION BY bk) <= 256),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    a.title AS ta, b.title AS tb
      |  FROM blocked a JOIN blocked b ON b.bk = a.bk AND a.doc_id < b.doc_id)""".stripMargin

  def q172FuzzyJoin(spark: SparkSession, dir: String): DataFrame =
    blockedTitlePairs(spark, dir)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"))
      .filter(col("dist") <= 8)

  val q172FuzzyJoinSql: String =
    s"""WITH $blockedTitleCtes
      |SELECT id_a, id_b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist
      |FROM cand WHERE levenshtein(ta, tb) <= 8""".stripMargin

  /** q182: Jaro–Winkler rerank of the q172 blocked candidates — the
    * second record-linkage scorer (transposition-tolerant, prefix-
    * weighted; the one name/title matchers actually ship) via the NATIVE
    * codegen kernel [[graft.functions.JaroWinklerExpr]], certified
    * byte-for-byte against DuckDB's built-in `jaro_winkler_similarity`
    * at 1e−6. Same two-key blocking (never all-pairs); the scorer is a
    * per-pair projection inside whole-stage codegen. */
  def q182JaroWinkler(spark: SparkSession, dir: String): DataFrame =
    blockedTitlePairs(spark, dir)
      .select(col("id_a"), col("id_b"),
        round(graft.functions.TextFunctions.jaro_winkler(col("ta"), col("tb"))
          * lit(1e6)).cast("long").as("jw_fp6"))
      .filter(col("jw_fp6") >= 800000L)

  val q182JaroWinklerSql: String =
    s"""WITH $blockedTitleCtes
      |SELECT id_a, id_b,
      |  CAST(round(jaro_winkler_similarity(ta, tb) * 1e6) AS BIGINT) AS jw_fp6
      |FROM cand
      |WHERE CAST(round(jaro_winkler_similarity(ta, tb) * 1e6) AS BIGINT)
      |  >= 800000""".stripMargin

  /** q185: weighted (multiset) Jaccard verify over the MinHash
    * candidates — `Σ min(tf_a,tf_b) / Σ max(tf_a,tf_b)` on token
    * MULTISETS, the measure that distinguishes "same words, same
    * proportions" from the set-Jaccard the signature estimates (a doc
    * repeated against its own excerpt scores very differently here).
    * Candidates gate at est ≥ 0.5 (= an INTEGER ≥4-of-8 hash match —
    * 4/8 is exact in binary, so the cut is engine-stable); the verify
    * joins per-pair token tf tables FULL OUTER so one-sided tokens
    * contribute min 0 / max tf. Verify cost is candidate-mass × doc
    * length — linear in what the LSH admits, never corpus². */
  def q185WeightedJaccard(spark: SparkSession, dir: String): DataFrame = {
    val cand = Dedup.minhashCandidates(
      Tables.spread(Tables.documents(spark, dir)), "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint() // feeds both sides of the tf attach
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val x = cand.join(tf.select(col("doc_id").as("id_a"), col("tok"),
      col("tf").as("tfa")), Seq("id_a"))
    val y = cand.join(tf.select(col("doc_id").as("id_b"), col("tok"),
      col("tf").as("tfb")), Seq("id_b"))
    x.join(y, Seq("id_a", "id_b", "tok"), "full_outer")
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(coalesce(col("tfa"), lit(0L)), coalesce(col("tfb"), lit(0L))))
          .as("s_min"),
        sum(greatest(coalesce(col("tfa"), lit(0L)), coalesce(col("tfb"), lit(0L))))
          .as("s_max"))
      .select(col("id_a"), col("id_b"), col("s_min"), col("s_max"),
        round(lit(1e6) * col("s_min") / col("s_max")).cast("long").as("wj_fp6"))
  }

  val q185WeightedJaccardSql: String =
    s"""WITH ${OracleFragments.minhashSigCtes("documents")},
      |cand AS (
      |  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b
      |  FROM sig s1
      |  JOIN sig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh
      |    AND s1.doc_id < s2.doc_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 4),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  GROUP BY 1, 2),
      |x AS (
      |  SELECT c.id_a, c.id_b, t.tok, t.tf AS tfa
      |  FROM cand c JOIN tf t ON t.doc_id = c.id_a),
      |y AS (
      |  SELECT c.id_a, c.id_b, t.tok, t.tf AS tfb
      |  FROM cand c JOIN tf t ON t.doc_id = c.id_b),
      |m AS (
      |  SELECT id_a, id_b,
      |    least(COALESCE(tfa, 0), COALESCE(tfb, 0)) AS mn,
      |    greatest(COALESCE(tfa, 0), COALESCE(tfb, 0)) AS mx
      |  FROM x FULL JOIN y USING (id_a, id_b, tok))
      |SELECT id_a, id_b,
      |  CAST(SUM(mn) AS BIGINT) AS s_min, CAST(SUM(mx) AS BIGINT) AS s_max,
      |  CAST(round(1e6 * SUM(mn) / SUM(mx)) AS BIGINT) AS wj_fp6
      |FROM m GROUP BY 1, 2""".stripMargin

  /** Fellegi–Sunter per-field m/u probabilities (match/unmatch
    * agreement rates) and the derived log₂-odds agreement/disagreement
    * weights, fp6-quantized ONCE here in Scala and embedded as integer
    * literals in BOTH engines — neither engine ever calls `log`, so the
    * score is libm-free integer addition end-to-end. Fields: head-8
    * exact match, mid-8 edit distance ≤ 2, whole-title Jaro–Winkler
    * ≥ 0.9 (the q182-certified native kernel / DuckDB built-in). */
  private val fsFields: Seq[(Double, Double)] =
    Seq((0.90, 0.01), (0.80, 0.05), (0.95, 0.02))
  private def fsLog2Fp6(num: Double, den: Double): Long =
    math.round(math.log(num / den) / math.log(2.0) * 1e6)
  private val fsAgree    = fsFields.map { case (m, u) => fsLog2Fp6(m, u) }
  private val fsDisagree = fsFields.map { case (m, u) => fsLog2Fp6(1 - m, 1 - u) }

  /** q192: Fellegi–Sunter probabilistic record linkage (Fellegi &
    * Sunter 1969) over the blocked title candidates — the classical
    * decision rule every entity-resolution system descends from. Each
    * candidate pair gets an agreement vector over three fields of
    * decreasing hardness (exact head, fuzzy mid, whole-string JW); the
    * total match weight is `Σ log₂(m/u)` over agreeing fields plus
    * `Σ log₂((1−m)/(1−u))` over disagreeing ones, and thresholds split
    * link (≥ 10 bits) / possible / non-link (≤ 0 bits) — the band a
    * human review queue receives.
    *
    * Scale shape: identical to q172/q182 — capped equi-join blocking
    * (never all-pairs), then a pure scoring projection inside codegen;
    * the weights are compile-time integer literals (see [[fsFields]]),
    * so scoring adds zero float work per pair. */
  /** The Fellegi–Sunter fp6 match weight over (ta, tb) — shared by the
    * q192 gate and the q205 link generation. */
  private def fsScoreFp6: org.apache.spark.sql.Column = {
    val jw6 = round(graft.functions.TextFunctions.jaro_winkler(col("ta"), col("tb"))
      * lit(1e6)).cast("long")
    val agree = Seq(
      substring(col("ta"), 1, 8) === substring(col("tb"), 1, 8),
      levenshtein(substring(col("ta"), 9, 8), substring(col("tb"), 9, 8)) <= 2,
      jw6 >= 900000L)
    agree.zipWithIndex.map { case (a, i) =>
      when(a, lit(fsAgree(i))).otherwise(lit(fsDisagree(i)))
    }.reduce(_ + _)
  }

  def q192FellegiSunter(spark: SparkSession, dir: String): DataFrame = {
    blockedTitlePairs(spark, dir)
      .withColumn("score_fp6", fsScoreFp6)
      .select(col("id_a"), col("id_b"), col("score_fp6"),
        when(col("score_fp6") >= 10000000L, lit("link"))
          .when(col("score_fp6") <= 0L, lit("nonlink"))
          .otherwise(lit("possible")).as("decision"))
  }

  val q192FellegiSunterSql: String = {
    val terms = Seq(
      "substr(ta, 1, 8) = substr(tb, 1, 8)",
      "levenshtein(substr(ta, 9, 8), substr(tb, 9, 8)) <= 2",
      "CAST(round(jaro_winkler_similarity(ta, tb) * 1e6) AS BIGINT) >= 900000")
      .zipWithIndex.map { case (cond, i) =>
        s"CASE WHEN $cond THEN ${fsAgree(i)} ELSE ${fsDisagree(i)} END"
      }.mkString("(", "\n      |     + ", ")")
    s"""WITH $blockedTitleCtes,
      |sc AS (
      |  SELECT id_a, id_b,
      |    $terms AS score_fp6
      |  FROM cand)
      |SELECT id_a, id_b, CAST(score_fp6 AS BIGINT) AS score_fp6,
      |  CASE WHEN score_fp6 >= 10000000 THEN 'link'
      |       WHEN score_fp6 <= 0 THEN 'nonlink'
      |       ELSE 'possible' END AS decision
      |FROM sc""".stripMargin
  }

  /** q203: exact set-similarity join with prefix filtering (PPJoin
    * family — Xiao et al. 2008, "Efficient Similarity Joins for Near
    * Duplicate Detection"): every pair with 3-shingle-set Jaccard
    * ≥ 0.7, found EXACTLY (no MinHash estimation error) without
    * all-pairs — the ground-truth join the q24/q163 estimators are
    * judged against. Three classical pruning rules: the PREFIX filter
    * (order each doc's shingles rarest-first by global df; a
    * qualifying pair must share a shingle among each side's first
    * `|d| − ⌈0.7·|d|⌉ + 1`), the LENGTH filter (`0.7·|a| ≤ |b|`, as
    * the integer cross-multiply `10·|b| ≥ 7·|a|`), and the POSITIONAL
    * filter (the first shared prefix token bounds the overlap by
    * 1 + the smaller remaining suffix — see the inline note). The
    * final gate is the exact integer test `10·∩ ≥ 7·(|a|+|b|−∩)`.
    *
    * Prefix units are 3-SHINGLES, not unigrams, deliberately: the
    * prefix filter's selectivity comes from low-df units, and a
    * fixed-vocabulary corpus has NO low-df unigrams (measured: the
    * unigram form admits 3.7M candidates at sf0.1 where the shingle
    * form admits 105k — shingle vocabulary grows combinatorially, so
    * rarest-first prefixes actually prune). Verification cost is
    * candidate-mass × set size; the distinct shingle stream is
    * barriered once and feeds df, sizes, prefix, and both verify
    * sides. */
  def q203PpJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(array_distinct(
        graft.ops.TextOps.shingles(split(col("text"), " "), 3))).as("tok"))
      .localCheckpoint()
    val dfq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pref = toks.join(dfq, Seq("tok")).join(sizes, Seq("doc_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
      .filter(col("rnk") <=
        col("sz") - ceil(lit(0.7) * col("sz")).cast("long") + 1)
      .select(col("tok"), col("doc_id"), col("sz"), col("rnk"))
    val a = pref.select(col("tok"), col("doc_id").as("id_a"),
      col("sz").as("sza"), col("rnk").as("pa"))
    val b = pref.select(col("tok"), col("doc_id").as("id_b"),
      col("sz").as("szb"), col("rnk").as("pb"))
    // POSITIONAL filter (the third classical PPJoin rule): both docs
    // order their shingles by the same global (df, tok) key, so the
    // min-rank shared prefix token is the FIRST shared token in both —
    // no shared token precedes it in either doc — and the overlap is
    // bounded by 1 + min(remaining-after-it on each side). A pair needs
    // overlap ≥ ⌈7·(sza+szb)/17⌉ (the Jaccard-0.7 identity), so the
    // integer form is 17·(1 + least(sza−pa, szb−pb)) ≥ 7·(sza+szb).
    // Like the prefix and length rules it only discards NON-qualifying
    // candidates before the expensive verify join — the unchanged
    // oracle certifies zero semantic change.
    val cand = a.join(b, Seq("tok")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("sza"), col("szb"))
      .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"))
      .filter(col("szb") * 10 >= col("sza") * 7 &&
        col("sza") * 10 >= col("szb") * 7)
      .filter(lit(17) * (lit(1) + least(col("sza") - col("pa"),
        col("szb") - col("pb"))) >= lit(7) * (col("sza") + col("szb")))
      .select(col("id_a"), col("id_b"), col("sza"), col("szb"))
      .localCheckpoint()
    val inter = cand.select(col("id_a"), col("id_b"))
      .join(toks.select(col("doc_id").as("id_a"), col("tok")), Seq("id_a"))
      .join(toks.select(col("doc_id").as("id_b"), col("tok")), Seq("id_b", "tok"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val uni = col("sza") + col("szb") - col("inter")
    cand.join(inter, Seq("id_a", "id_b"))
      .filter(col("inter") * 10 >= uni * 7)
      .select(col("id_a"), col("id_b"), col("inter"), uni.as("uni"),
        round(lit(1e6) * col("inter") / uni).cast("long").as("jaccard_fp6"))
  }

  val q203PpJoinSql: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |toks AS (
      |  SELECT DISTINCT doc_id,
      |    t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS tok
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
      |        FROM tk WHERE len(t) >= 3)),
      |dfq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY 1),
      |szs AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY 1),
      |pref AS (
      |  SELECT t.tok, t.doc_id, s.sz
      |  FROM toks t JOIN dfq USING (tok) JOIN szs s USING (doc_id)
      |  QUALIFY row_number() OVER (PARTITION BY t.doc_id
      |      ORDER BY dfq.df, t.tok)
      |    <= s.sz - CAST(ceil(0.7 * s.sz) AS BIGINT) + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    a.sz AS sza, b.sz AS szb
      |  FROM pref a JOIN pref b ON b.tok = a.tok AND a.doc_id < b.doc_id
      |  WHERE b.sz * 10 >= a.sz * 7 AND a.sz * 10 >= b.sz * 7),
      |inter AS (
      |  SELECT c.id_a, c.id_b, COUNT(*) AS inter
      |  FROM cand c
      |  JOIN toks x ON x.doc_id = c.id_a
      |  JOIN toks y ON y.doc_id = c.id_b AND y.tok = x.tok
      |  GROUP BY 1, 2)
      |SELECT c.id_a, c.id_b, i.inter,
      |  c.sza + c.szb - i.inter AS uni,
      |  CAST(round(1e6 * i.inter / (c.sza + c.szb - i.inter)) AS BIGINT)
      |    AS jaccard_fp6
      |FROM cand c JOIN inter i USING (id_a, id_b)
      |WHERE i.inter * 10 >= (c.sza + c.szb - i.inter) * 7""".stripMargin

  /** q205: entity-resolution pipeline — the q192 Fellegi–Sunter
    * decision feeding connected components: pairs classified `link`
    * become edges, components become entities, and the report is the
    * cluster table (representative + size) a mastering system persists.
    * This is the composition every ER deployment runs (blocking →
    * scoring → clustering), certified end-to-end against a recursive
    * transitive-closure oracle.
    *
    * Scale shape: the edge list is capped-block linear (q192's
    * guarantee); CC runs the LOCALITY-CONDENSED path (r17): the `link`
    * decision requires ≥ 10 fp-bits, reachable ONLY when all three
    * fields agree (best two-of-three tops out at 9.81 bits), and
    * field 1 agreement IS head-8 title equality — so every link edge's
    * endpoints share the head-8 block key, transitively the whole
    * component does, and the per-partition union-find pre-pass keyed
    * on `bk` collapses each component to a single star before the
    * loop ever runs (the loop then closes on identity edges in one
    * round instead of O(log diameter) join+checkpoint generations). */
  def q205ErClusters(spark: SparkSession, dir: String): DataFrame = {
    val links = blockedTitlePairs(spark, dir, keepBlock = true)
      .filter(fsScoreFp6 >= 10000000L)
      .select(col("id_a"), col("id_b"), col("bk"))
    Dedup.connectedComponentsCondensed(links, col("bk"))
      .groupBy(col("rep")).agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= 2)
      .select(col("rep").as("cluster_rep"), col("n_members"))
  }

  val q205ErClustersSql: String = {
    val terms = Seq(
      "substr(ta, 1, 8) = substr(tb, 1, 8)",
      "levenshtein(substr(ta, 9, 8), substr(tb, 9, 8)) <= 2",
      "CAST(round(jaro_winkler_similarity(ta, tb) * 1e6) AS BIGINT) >= 900000")
      .zipWithIndex.map { case (cond, i) =>
        s"CASE WHEN $cond THEN ${fsAgree(i)} ELSE ${fsDisagree(i)} END"
      }.mkString("(", " + ", ")")
    s"""WITH RECURSIVE $blockedTitleCtes,
      |links AS (
      |  SELECT id_a, id_b FROM cand
      |  WHERE $terms >= 10000000),
      |sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM links
      |  UNION ALL
      |  SELECT id_b, id_a FROM links),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id),
      |comp AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id)
      |SELECT CAST(rep AS BIGINT) AS cluster_rep, COUNT(*) AS n_members
      |FROM comp GROUP BY rep HAVING COUNT(*) >= 2""".stripMargin
  }

  /** q209: SimHash radius operating curve — for hamming radius 0..3
    * over the q105 banded candidates, the cumulative candidate-pair
    * count and the share of those pairs that are BYTE-IDENTICAL
    * documents (md5(text) equality): the table read when choosing the
    * SimHash cut-off, where radius 0 should be almost purely exact
    * dups and each extra bit trades recall of near-dups for precision.
    * The q163 threshold-curve discipline applied to the SimHash family
    * (radius grid LEFT-joined so all four rows survive empty radii).
    *
    * Scale shape: candidates come from the pigeonhole band join (never
    * all-pairs); the exact-dup flag attaches by two hash joins on the
    * pair endpoints; the curve itself is a 4-row window. */
  def q209SimhashRadius(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Dedup.simhashNearDup(
      Tables.spread(Tables.documents(spark, dir)), "doc_id", "text",
      bits = 60, bands = 4, maxHamming = 3)
    val h = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("th"))
    val byH = pairs
      .join(h.select(col("doc_id").as("id_a"), col("th").as("ha")), Seq("id_a"))
      .join(h.select(col("doc_id").as("id_b"), col("th").as("hb")), Seq("id_b"))
      .select(col("hamming"), (col("ha") === col("hb")).cast("long").as("ex"))
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n"), sum(col("ex")).as("nex"))
    val grid = spark.range(0, 4).select(col("id").as("radius"))
    val w = Window.orderBy(col("radius"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(byH, col("hamming") === col("radius"), "left")
      .select(col("radius"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("nex"), lit(0L)).as("nex"))
      .select(col("radius"), sum(col("n")).over(w).as("n_pairs"),
        sum(col("nex")).over(w).as("n_exact"))
      .select(col("radius"), col("n_pairs"), col("n_exact"),
        when(col("n_pairs") > 0,
          round(lit(1e6) * col("n_exact") / col("n_pairs")).cast("long"))
          .otherwise(lit(0L)).as("exact_share_fp6"))
  }

  val q209SimhashRadiusSql: String =
    s"""WITH $simhashSigCtes,
       |bands AS (
       |  SELECT doc_id, simhash, unnest(range(0, 4)) AS b FROM ssig),
       |keyed AS (
       |  SELECT doc_id, simhash, b,
       |    (simhash >> CAST(b * 15 AS INT)) & 32767 AS key FROM bands),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM keyed a JOIN keyed b
       |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
       |ham AS (
       |  SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |  FROM cand WHERE bit_count(xor(sa, sb)) <= 3),
       |hx AS (SELECT doc_id, md5(text) AS th FROM documents),
       |fl AS (
       |  SELECT h.hamming, CASE WHEN a.th = b.th THEN 1 ELSE 0 END AS ex
       |  FROM ham h JOIN hx a ON a.doc_id = h.doc_a
       |  JOIN hx b ON b.doc_id = h.doc_b),
       |byh AS (
       |  SELECT hamming, COUNT(*) AS n, CAST(SUM(ex) AS BIGINT) AS nex
       |  FROM fl GROUP BY 1),
       |grid AS (SELECT unnest(range(0, 4)) AS radius),
       |cum AS (
       |  SELECT CAST(g.radius AS BIGINT) AS radius,
       |    CAST(SUM(COALESCE(b.n, 0)) OVER (ORDER BY g.radius) AS BIGINT)
       |      AS n_pairs,
       |    CAST(SUM(COALESCE(b.nex, 0)) OVER (ORDER BY g.radius) AS BIGINT)
       |      AS n_exact
       |  FROM grid g LEFT JOIN byh b ON b.hamming = g.radius)
       |SELECT radius, n_pairs, n_exact,
       |  CASE WHEN n_pairs > 0
       |    THEN CAST(round(1e6 * n_exact / n_pairs) AS BIGINT)
       |    ELSE 0 END AS exact_share_fp6
       |FROM cum""".stripMargin

  /** q248: multi-resolution cross-document repeat profile — for every
    * doc, the LONGEST window length (power-of-2 grid: 8/16/32/64
    * tokens) at which it still shares a verbatim token window with
    * ANOTHER document. This is the exact-substring dedup audit of Lee
    * et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499) at suffix-array resolution collapsed to
    * doubling widths: a doc whose max_w is 64 carries a near-verbatim
    * block (memorization risk), max_w 8 only phrase-level overlap, 0
    * none — and the per-(source, max_w) histogram is the curation
    * dashboard that says WHICH feed ships boilerplate. Complements
    * [[q93StripSpans]] (which removes fixed-width-8 spans) by measuring
    * how DEEP the duplication runs before anything is removed.
    *
    * Construction: one corpus scan; per width the codegen'd
    * [[graft.functions.TextFunctions.distinct_shingles]] kernel emits
    * each doc's distinct w-token windows (distinct-per-doc ⇒ the global
    * per-window count IS its document frequency), windows collapse to
    * md5-hex8 ints before the shuffle (both engines hash identically,
    * so collisions — ~n²/2³³ — are value-identical on both sides), one
    * groupBy finds windows with df ≥ 2, one semi-join + two aggregates
    * fold to the per-doc profile, and a left join restores the
    * no-repeat docs into the max_w = 0 bucket.
    *
    * Scale: window mass is ~4 rows per token (Σ_w (L−w+1) < 4L), all
    * long-hashed before any exchange; the df table and semi-join
    * shuffle ints, never window text. At 100 TB this is the same
    * shape as the certified MinHash band join — bounded fan-out per
    * doc, no pair explosion (dup counting happens in the aggregate,
    * not via doc-doc joins). */
  def q248RepeatProfile(spark: SparkSession, dir: String): DataFrame = {
    val widths = Seq(8, 16, 32, 64)
    val d = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), col("text"))
    val sh = d
      .select(col("doc_id"), col("source"), explode(array(widths.map(w =>
        struct(lit(w).as("w"),
          graft.functions.TextFunctions.distinct_shingles(col("text"), w)
            .as("s"))): _*)).as("x"))
      .select(col("doc_id"), col("source"), col("x.w").as("w"),
        explode(col("x.s")).as("sh"))
      .select(col("doc_id"), col("source"), col("w"),
        graft.ops.TrainingMix.hex8(col("sh")).as("h"))
    val dup = sh.groupBy(col("w"), col("h"))
      .agg(count(lit(1)).as("df")).filter(col("df") >= 2)
      .select(col("w"), col("h"))
    val perDoc = sh.join(dup, Seq("w", "h"), "left_semi")
      .groupBy(col("doc_id"), col("source"), col("w"))
      .agg(count(lit(1)).as("n_dup"))
    val prof = perDoc.groupBy(col("doc_id"), col("source"))
      .agg(max(col("w")).as("max_w"),
        sum(when(col("w") === 8, col("n_dup")).otherwise(lit(0L))).as("dup8"))
    d.select(col("doc_id"), col("source"))
      .join(prof.select(col("doc_id"), col("max_w"), col("dup8")),
        Seq("doc_id"), "left")
      .select(col("source"), coalesce(col("max_w"), lit(0)).as("max_w"),
        coalesce(col("dup8"), lit(0L)).as("dup8"), col("doc_id"))
      .groupBy(col("source"), col("max_w"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dup8")).as("dup8_mass"),
        sum(col("doc_id")).as("id_sum"))
  }

  val q248RepeatProfileSql: String = {
    import OracleFragments.hex8Sql
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, source, w, sh FROM (
       |    SELECT doc_id, source, ws.w AS w,
       |      unnest(list_transform(generate_series(1, len(t) - ws.w + 1),
       |        i -> array_to_string(t[i:i+ws.w-1], ' '))) AS sh
       |    FROM toks CROSS JOIN (SELECT unnest([8,16,32,64]) AS w) ws(w))),
       |hashed AS (
       |  SELECT doc_id, source, w, ${hex8Sql("sh")} AS h FROM sh),
       |dup AS (
       |  SELECT w, h FROM hashed GROUP BY w, h HAVING COUNT(*) >= 2),
       |perdoc AS (
       |  SELECT doc_id, source, w, COUNT(*) AS n_dup
       |  FROM hashed JOIN dup USING (w, h) GROUP BY 1, 2, 3),
       |prof AS (
       |  SELECT doc_id, MAX(w) AS max_w,
       |    SUM(CASE WHEN w = 8 THEN n_dup ELSE 0 END) AS dup8
       |  FROM perdoc GROUP BY 1),
       |alld AS (
       |  SELECT d.source, COALESCE(p.max_w, 0) AS max_w,
       |    COALESCE(p.dup8, 0) AS dup8, d.doc_id
       |  FROM documents d LEFT JOIN prof p ON d.doc_id = p.doc_id)
       |SELECT source, CAST(max_w AS INT) AS max_w,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(dup8) AS BIGINT) AS dup8_mass,
       |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
       |FROM alld GROUP BY 1, 2""".stripMargin
  }

  /** q250 gram width (tokens), winnow window (grams), and the
    * boilerplate mask: hashes fingerprinting more than this many docs
    * are dropped before the pair join (the MOSS "too common to be
    * interesting" rule — shared headers/footers would otherwise link
    * every doc to every doc). Shared with the oracle SQL. */
  private val WinK = 4
  private val WinW = 4
  private val WinMaxDf = 50

  /** q250: winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    * MOSS algorithm) + the cross-document overlap report. Each doc's
    * k-token grams hash to hex8 ints; every w-gram window contributes
    * its MINIMUM hash, and the distinct per-doc minima are the
    * fingerprint set — the winnowing guarantee: any shared run of
    * k+w−1 tokens between two docs yields at least one shared
    * fingerprint, with expected density 2/(w+1) of the gram stream
    * (~8× smaller than the full gram set q248 ships). The report:
    * doc pairs sharing ≥2 fingerprints, heaviest overlap first.
    * (The classic rightmost-tie rule only disambiguates WHICH position
    * carries a repeated window minimum; the fingerprint SET — all the
    * report consumes — is the distinct per-window minima either way,
    * so neither engine needs positional tie-breaking.)
    *
    * Scale shape: the whole per-doc computation — gram hex8 keys, the
    * O(m) monotone-deque sliding minimum, the distinct — runs inside
    * the codegen'd [[graft.functions.WinnowFingerprintsExpr]] kernel as
    * ONE projection (the MinHashSlicesExpr discipline): nothing row-
    * explodes before the fingerprint table, which is ~2/(w+1) of the
    * gram count. (The first cut was declarative — gram posexplode +
    * window-id explode + per-window min aggregate — and CollapseProject
    * pushed the interpreted shingle zip past the generators, re-
    * evaluating it per exploded row: the q158 probe class, 40–90 s at
    * sf0.1 vs ~1 s here.) The pair join runs on fingerprint hashes
    * AFTER the df ≤ MaxDf mask, which caps per-hash fan-out at MaxDf²
    * pairs — the same bounded-block argument as the capped ER join
    * (q205). */
  def q250Winnowing(spark: SparkSession, dir: String): DataFrame =
    winnowReport(spark, dir, WinK, WinW)

  /** The (k, w)-parameterized q250 overlap report — one body for every
    * certified operating point, so a new point is a parameter choice,
    * not a reimplementation (the autoBits precedent applied to span
    * fingerprints). */
  private def winnowReport(spark: SparkSession, dir: String, k: Int,
      w: Int): DataFrame = {
    val d = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    // fingerprints: distinct per-window minima (kernel output is already
    // distinct per doc); barriered — the df mask and both pair-join
    // sides read it (fingerprint-sized: ~2/(w+1) of the gram stream)
    val sel = d.select(col("doc_id"),
        explode(graft.functions.TextFunctions.winnow_fingerprints(
          col("text"), k, w)).as("h"))
      .localCheckpoint()
    val masked = sel.join(
      sel.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") > WinMaxDf).select(col("h")),
      Seq("h"), "left_anti")
    masked.select(col("h"), col("doc_id").as("id_a"))
      .join(masked.select(col("h"), col("doc_id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy(col("n_shared").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** The q250/q253/q255/q256 shared oracle CTEs ending in `sel(doc_id, h)`
    * (the per-doc distinct winnowing fingerprints at the given gram
    * width `k` and window `w`) and `mask(h)` (the boilerplate hashes
    * with df > [[WinMaxDf]]). `from` is the (doc_id, text) relation to
    * fingerprint — the corpus by default, a curated CTE for gates that
    * fingerprint a stage's survivors (q256). */
  private def winnowSelMaskCtes(k: Int = WinK, w: Int = WinW,
      from: String = "documents"): String = {
    import OracleFragments.hex8Sql
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM $from),
       |g0 AS (
       |  SELECT doc_id, len(t) - ${k - 1} AS mg,
       |    unnest(list_transform(generate_series(1, len(t) - ${k - 1}),
       |      i -> struct_pack(pos := i,
       |             sh := array_to_string(t[i:i+${k - 1}], ' ')))) AS u
       |  FROM toks),
       |g AS (
       |  SELECT doc_id, mg, u.pos AS pos, ${hex8Sql("u.sh")} AS h FROM g0),
       |wg AS (
       |  SELECT doc_id, h,
       |    unnest(generate_series(greatest(1, pos - ${w - 1}),
       |                           least(pos, mg - ${w - 1}))) AS wi
       |  FROM g WHERE mg >= $w),
       |sel AS (
       |  SELECT DISTINCT doc_id, h FROM (
       |    SELECT doc_id, wi, MIN(h) AS h FROM wg GROUP BY 1, 2)),
       |mask AS (
       |  SELECT h FROM sel GROUP BY h HAVING COUNT(*) > $WinMaxDf)""".stripMargin
  }

  val q250WinnowingSql: String =
    s"""WITH ${winnowSelMaskCtes()},
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
       |  FROM sel a
       |  JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
       |  WHERE a.h NOT IN (SELECT h FROM mask)
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
       |FROM pairs ORDER BY n_shared DESC, id_a, id_b LIMIT 50""".stripMargin

  /** q253: incremental winnowing-fingerprint ingest — the q68/q101
    * exactly-once index contract applied to the q250 span-fingerprint
    * family, completing the span-dedup tier for streaming ingest. The
    * corpus splits at the median doc_id: the "already-ingested" half's
    * fingerprints live in a persisted [[graft.ops.BatchIndex]] built by
    * TWO committed batch appends (quarter split — the protocol itself is
    * under test: replayed appends are no-ops, so re-runs serve straight
    * from parquet); the "new batch" half is fingerprinted once and
    * joined against index ∪ itself, never index-vs-index. Output =
    * every pair sharing ≥ 2 surviving fingerprints with at least one
    * new-batch endpoint (id_b ≥ split ⟺ ≥1 new endpoint, since id_b is
    * the greater id). The boilerplate mask is cumulative (df over
    * index ∪ batch = the full corpus here), so the oracle — a full
    * recompute filtered to id_b ≥ split — certifies that the
    * incremental path loses nothing vs recomputing from scratch. */
  def q253WinnowIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    // one 2-value scalar to the driver: the split keys the artifact path,
    // so it cannot stay lazy (the q68 discipline)
    val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    // min/max over an empty corpus is the all-NULL row (the r17 q210
    // lesson): return the empty candidate frame instead of NPEing
    if (r.isNullAt(0)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id_a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id_b",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_shared",
          org.apache.spark.sql.types.LongType))))
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val split = (lo + hi) / 2
    val quarter = (lo + split) / 2
    val indexPath = graft.core.Artifacts.path(spark,
      s"$dir/documents.parquet", s"winidx_k${WinK}_w${WinW}_s$split")
    Dedup.appendToWinnowIndex(docs.filter(col("doc_id") < quarter),
      "doc_id", "text", indexPath, batchId = 0L, k = WinK, w = WinW)
    Dedup.appendToWinnowIndex(
      docs.filter(col("doc_id") >= quarter && col("doc_id") < split),
      "doc_id", "text", indexPath, batchId = 1L, k = WinK, w = WinW)
    Dedup.winnowCandidatesIncremental(docs.filter(col("doc_id") >= split),
      "doc_id", "text", Dedup.readWinnowIndex(spark, indexPath),
      k = WinK, w = WinW, maxDf = WinMaxDf, minShared = 2)
  }

  val q253WinnowIngestSql: String =
    s"""WITH ${winnowSelMaskCtes()},
       |split AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS v FROM documents)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM sel a
       |JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
       |WHERE a.h NOT IN (SELECT h FROM mask)
       |  AND b.doc_id >= (SELECT v FROM split)
       |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin

  /** q255 winnow window — the second certified operating point beside
    * q250/q253's w = 4 (same gram width k = 4). */
  private val WinW8 = 8

  /** q255: the q250 overlap report at the SECOND winnowing operating
    * point — same k = 4 gram width, window w = 8. This certifies the
    * (k, w) trade the MOSS paper documents as a RULE rather than a
    * single tuned point (the autoBits precedent applied to span
    * fingerprints): widening the window thins the fingerprint density
    * from 2/(w+1) = 2/5 to 2/9 of the gram stream (~2.2× less state to
    * shuffle, store, and join) while weakening the detection guarantee
    * from "any shared run ≥ k+w−1 = 7 tokens yields a shared
    * fingerprint" to runs ≥ 11 tokens — the dial a 100 TB corpus turns
    * when fingerprint volume, not recall on short overlaps, is the
    * binding constraint. Identical engine body and oracle CTEs as q250,
    * parameterized by (k, w) — so both operating points are certified
    * through the same construction, and the density/guarantee rule is
    * what the pair of green gates proves. */
  def q255WinnowingW8(spark: SparkSession, dir: String): DataFrame =
    winnowReport(spark, dir, WinK, WinW8)

  val q255WinnowingW8Sql: String =
    s"""WITH ${winnowSelMaskCtes(WinK, WinW8)},
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
       |  FROM sel a
       |  JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
       |  WHERE a.h NOT IN (SELECT h FROM mask)
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
       |FROM pairs ORDER BY n_shared DESC, id_a, id_b LIMIT 50""".stripMargin

  // ---- q256: the composed curation-ingest funnel (r19) ----------------

  private val CurateMinQ = 0.8
  private val CurateThresh = 0.5

  private val q256Schema = org.apache.spark.sql.types.StructType.fromDDL(
    "batch_id LONG, n_in LONG, n_gated LONG, n_admitted LONG, " +
      "admitted_id_sum LONG, n_span_cand LONG, span_id_sum LONG, " +
      "idx_n_docs LONG, idx_tot_len LONG")

  /** q256: the COMPOSED curation-ingest funnel — the
    * [[graft.streaming.DocStream.curateBatch]] loop (quality gate →
    * MinHash dedup admit → winnowing span candidates → BM25 posting
    * index, one shared admit decision) driven as two batch ingests over
    * the median-split corpus, certified end to end by the oracle
    * replaying EVERY stage in SQL. Output: one row per batch carrying
    * the funnel counts (docs in / past-quality / admitted), the admitted
    * id checksum, the per-batch span-candidate count + endpoint checksum
    * (batch-vs-index∪batch under the cumulative df mask — the q253
    * incremental contract on the ADMITTED corpus), and the posting
    * index's sentinel totals (doc count + token mass — which equal the
    * admitted corpus's exactly when, and only when, stage 4 consumed
    * precisely the admit decision). Any row-level divergence at any
    * stage — a doc mis-gated, a dup admitted, a candidate lost, a
    * posting double-counted — moves a count or checksum. The q244
    * counts-certification style applied to the INGEST-LOOP composition,
    * which no single-stage gate (q67/q68/q253/q254) covers.
    *
    * Keep-first parity note (why the oracle's two-stage loser sets are
    * exact): batch-0 losers are all greater endpoints of batch-0
    * internal pairs (within-batch chains included — `admittedOf` drops
    * every flagged endpoint regardless of its partner's own fate);
    * batch-1 candidates exist only against (ADMITTED batch 0 ∪ batch 1),
    * so a batch-1 loser needs a batch-1 partner or an admitted batch-0
    * one — the `id_a ∈ adm0 OR id_a ≥ split` condition verbatim.
    *
    * Exactly-once/artifact discipline (the q68/q253 pattern): the ingest
    * artifacts live under an [[graft.core.Artifacts]] path keyed by the
    * corpus fingerprint and split; the first run builds them (two
    * curateBatch calls, funnel markers committed LAST), every rerun
    * short-circuits on the markers and serves from parquet — bench
    * passes time the SERVING shape, the 100 TB read path. */
  def q256CurateIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    if (r.isNullAt(0)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], q256Schema)
    val split = (r.getLong(0) + r.getLong(1)) / 2
    val root = graft.core.Artifacts.path(spark, s"$dir/documents.parquet",
      s"curate_q80_t50_s$split")
    graft.streaming.DocStream.curateBatch(docs.filter(col("doc_id") < split),
      0L, root, minQuality = CurateMinQ, threshold = CurateThresh)
    graft.streaming.DocStream.curateBatch(docs.filter(col("doc_id") >= split),
      1L, root, minQuality = CurateMinQ, threshold = CurateThresh)
    val funnel = graft.streaming.DocStream.curationFunnel(spark, root)
      .select(col("batch_id"), col("n_in"), col("n_gated"), col("n_admitted"))
    // per-batch sink reads carry explicit schemas: an all-gated or
    // all-deduped batch writes an empty dir with no footer to infer from
    def admOf(b: Long) = spark.read
      .schema("doc_id LONG, text STRING")
      .parquet(s"$root/admitted/batch=$b")
      .agg(coalesce(sum(col("doc_id")), lit(0L)).as("admitted_id_sum"))
      .select(lit(b).as("batch_id"), col("admitted_id_sum"))
    def candOf(b: Long) = spark.read
      .schema("id_a LONG, id_b LONG, n_shared LONG")
      .parquet(s"$root/span_cand/batch=$b")
      .agg(count(lit(1)).as("n_span_cand"),
        coalesce(sum(col("id_a") + col("id_b")), lit(0L)).as("span_id_sum"))
      .select(lit(b).as("batch_id"), col("n_span_cand"), col("span_id_sum"))
    // posting-index sentinels: per-batch (term NULL) rows sum to the
    // admitted corpus's doc count + token mass IFF stage 4 consumed the
    // admit decision exactly — attached as repeated global columns
    val idx = graft.ops.TextRank.readPostingIndex(spark, s"$root/bm25_idx")
      .filter(col("term").isNull)
      .agg(sum(col("doc_id")).as("idx_n_docs"), sum(col("tf")).as("idx_tot_len"))
    funnel
      .join(admOf(0L).unionByName(admOf(1L)), Seq("batch_id"))
      .join(candOf(0L).unionByName(candOf(1L)), Seq("batch_id"))
      .crossJoin(broadcast(idx))
  }

  val q256CurateIngestSql: String = {
    import OracleFragments.{minhashSigCtes, qualityExpr}
    val th = (CurateThresh * 8).toInt // est_jaccard = shared/8 ≥ 0.5 ⟺ shared ≥ 4
    s"""WITH split AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS v FROM documents),
       |bdoc AS (
       |  SELECT doc_id, text,
       |    CASE WHEN doc_id < (SELECT v FROM split) THEN 0 ELSE 1 END AS b
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, text, b, $qualityExpr AS q
       |  FROM (SELECT doc_id, text, b, string_split(text, ' ') AS toks FROM bdoc)),
       |gated AS (SELECT doc_id, text, b FROM scored WHERE q >= $CurateMinQ),
       |${minhashSigCtes("gated", "mh")},
       |cand AS (
       |  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b
       |  FROM mhsig s1
       |  JOIN mhsig s2 ON s1.seed = s2.seed AND s1.mh = s2.mh AND s1.doc_id < s2.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $th),
       |losers0 AS (SELECT DISTINCT id_b FROM cand WHERE id_b < (SELECT v FROM split)),
       |adm0 AS (SELECT doc_id, text FROM gated
       |         WHERE b = 0 AND doc_id NOT IN (SELECT id_b FROM losers0)),
       |losers1 AS (
       |  SELECT DISTINCT c.id_b FROM cand c
       |  WHERE c.id_b >= (SELECT v FROM split)
       |    AND (c.id_a >= (SELECT v FROM split)
       |         OR c.id_a IN (SELECT doc_id FROM adm0))),
       |adm1 AS (SELECT doc_id, text FROM gated
       |         WHERE b = 1 AND doc_id NOT IN (SELECT id_b FROM losers1)),
       |adm AS (SELECT doc_id, text FROM adm0 UNION ALL SELECT doc_id, text FROM adm1),
       |${winnowSelMaskCtes(from = "adm")},
       |selb AS (
       |  SELECT s.doc_id, s.h, g.b FROM sel s JOIN gated g ON g.doc_id = s.doc_id),
       |mask0 AS (SELECT h FROM selb WHERE b = 0 GROUP BY h HAVING COUNT(*) > $WinMaxDf),
       |cands0 AS (
       |  SELECT a.doc_id AS id_a, b2.doc_id AS id_b, COUNT(*) AS n
       |  FROM selb a JOIN selb b2 ON a.h = b2.h AND a.doc_id < b2.doc_id
       |  WHERE b2.b = 0 AND a.h NOT IN (SELECT h FROM mask0)
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |cands1 AS (
       |  SELECT a.doc_id AS id_a, b2.doc_id AS id_b, COUNT(*) AS n
       |  FROM selb a JOIN selb b2 ON a.h = b2.h AND a.doc_id < b2.doc_id
       |  WHERE b2.b = 1 AND a.h NOT IN (SELECT h FROM mask)
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |span AS (
       |  SELECT 0 AS batch_id, CAST(COUNT(*) AS BIGINT) AS n_span_cand,
       |    CAST(COALESCE(SUM(id_a + id_b), 0) AS BIGINT) AS span_id_sum
       |  FROM cands0
       |  UNION ALL
       |  SELECT 1, CAST(COUNT(*) AS BIGINT),
       |    CAST(COALESCE(SUM(id_a + id_b), 0) AS BIGINT) FROM cands1),
       |admagg AS (
       |  SELECT g.b AS batch_id, CAST(COUNT(*) AS BIGINT) AS n_admitted,
       |    CAST(COALESCE(SUM(a.doc_id), 0) AS BIGINT) AS admitted_id_sum
       |  FROM adm a JOIN gated g ON g.doc_id = a.doc_id GROUP BY 1),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS idx_n_docs,
       |    CAST(COALESCE(SUM(len(list_filter(string_split(text, ' '),
       |      x -> x <> ''))), 0) AS BIGINT) AS idx_tot_len
       |  FROM adm),
       |funnel AS (
       |  SELECT d.b AS batch_id, CAST(COUNT(*) AS BIGINT) AS n_in,
       |    CAST(COUNT(CASE WHEN s.q >= $CurateMinQ THEN 1 END) AS BIGINT) AS n_gated
       |  FROM bdoc d JOIN scored s ON s.doc_id = d.doc_id GROUP BY 1)
       |SELECT CAST(f.batch_id AS BIGINT) AS batch_id, f.n_in, f.n_gated,
       |  COALESCE(a.n_admitted, 0) AS n_admitted,
       |  COALESCE(a.admitted_id_sum, 0) AS admitted_id_sum,
       |  COALESCE(sp.n_span_cand, 0) AS n_span_cand,
       |  COALESCE(sp.span_id_sum, 0) AS span_id_sum,
       |  st.idx_n_docs, st.idx_tot_len
       |FROM funnel f
       |LEFT JOIN admagg a ON a.batch_id = f.batch_id
       |LEFT JOIN span sp ON sp.batch_id = f.batch_id
       |CROSS JOIN stats st""".stripMargin
  }
}
