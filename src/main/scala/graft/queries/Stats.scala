package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** CUBE and moment-statistics gate queries. Variance/stddev are computed
  * from exact decimal power sums (inputs carry ≤2 decimals, squares ≤4),
  * then finished with a handful of double ops — deterministic across
  * engines, unlike the built-in Welford-style `stddev`, whose update order
  * varies.
  */
object Stats {

  /** CUBE over (status, priority): all grouping-set combinations. */
  def q28Cube(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        graft.core.Det.dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))
  }

  /** Explicit GROUPING SETS — asymmetric aggregation levels a rollup/cube
    * can't express: (status, priority), (status), (priority-only), plus
    * the grand total. Dataset.groupingSets (Spark 4 API), same Expand
    * machinery as q12/q28. */
  def q55GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        graft.core.Det.dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))
  }

  val q55GroupingSetsSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), (o_orderpriority), ())""".stripMargin

  val q28CubeSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Distinct aggregation: exact distinct counts per group. Single-agg
    * Expand form: Catalyst rewrites the two distincts + plain count into
    * ONE scan and ONE shuffle of 3× narrow (suppkey, partkey|orderkey,
    * gid) rows with map-side partial dedup.
    *
    * Measured head-to-head at 6M rows (sf1-equivalent, local[32],
    * steady-state): Expand 1.83s vs the r1–r6 three-joined-jobs form
    * 1.28s — locally the three-scan shape stays faster because the
    * OS-cached parquet re-scans are nearly free while Expand pays real
    * CPU pushing 3× rows through the partial aggregate. That inverts on
    * a cluster reading remote storage, where the fact-table scan is the
    * dominant cost and the three-job form pays it three times; the gate
    * keeps the single-scan form because scan economy is what survives
    * the 100 TB scale-up (the ~0.5s local delta is bounded, the 3× IO
    * multiplier is not).
    *
    * Round-8 sf1 re-measurement (VERDICT r7 "next" #6): the sf0.1 ratio
    * does NOT collapse at 6M rows/32 splits — Spark Expand 2.0-2.9 s vs
    * DuckDB 0.13 s (and DuckDB grows only 0.10→0.13 s for 10× the data:
    * its perfect-hash multi-distinct is nearly all fixed cost). The gap
    * is that specialized operator, not a Spark plan defect; both known
    * Spark shapes were measured above and the scan-economical one is
    * kept. */
  def q29DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    // multi-distinct plans via EXPAND (3× the rows into the partial
    // aggregate); on the single-row-group local corpus that tripled
    // stream runs on ONE scan task unless spread first — at real scale
    // the scan has a task per row group and spread is the identity
    val l = Tables.spread(Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_partkey"), col("l_orderkey")))
    l.groupBy(col("l_suppkey"))
      .agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
  }

  val q29DistinctAggSql: String =
    """SELECT l_suppkey,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |GROUP BY l_suppkey""".stripMargin

  /** Mean / variance / stddev per group from exact decimal power sums:
    * var = (n·Σx² − (Σx)²) / (n·(n−1)), all inputs exact integers-in-
    * decimal, finished in double. */
  def q30Moments(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    // quantities are integer-valued doubles (corpus invariant the q30
    // oracle also relies on): long sums are exact, order-free, and ~2.5x
    // cheaper than decimal in the serial partial-agg path
    val x = round(col("l_quantity")).cast("long")
    val grouped = l.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum(x * x).cast("double").as("sum_x2"))
    grouped.select(
        col("l_returnflag"),
        col("n"),
        (col("sum_x") / col("n")).as("mean_qty"),
        ((col("n") * col("sum_x2") - col("sum_x") * col("sum_x")) /
          (col("n") * (col("n") - 1))).as("var_qty"),
        sqrt((col("n") * col("sum_x2") - col("sum_x") * col("sum_x")) /
          (col("n") * (col("n") - 1))).as("stddev_qty"))
  }

  /** Exact interpolated percentiles per group (both engines implement the
    * standard (n−1)·p linear interpolation; inputs are integer-valued
    * doubles, so results are exact). */
  def q32Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_quantity, array(0.25, 0.75))").as("iqr_qty"))
      .select(col("l_returnflag"), col("median_qty"), col("p90_qty"),
        col("iqr_qty").getItem(0).as("p25_qty"),
        col("iqr_qty").getItem(1).as("p75_qty"))
  }

  val q32PercentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  quantile_cont(l_quantity, 0.25) AS p25_qty,
      |  quantile_cont(l_quantity, 0.75) AS p75_qty
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** Quantile-SKETCH gate: `approx_percentile` (Spark's KLL-family
    * mergeable sketch — the 100 TB percentile path next to q32's exact
    * form, which needs a full sort-and-count per group). The sketch VALUE
    * depends on partial-merge order, so it can never hash-compare; its
    * rank-error CONTRACT does not: the returned value must hold some rank
    * within ±ε·n of the target rank (ε = 1/accuracy). The gate computes
    * the approx value per group, joins it back, counts rows strictly
    * below / at-or-below it in the SAME scan pass, and emits the contract
    * as booleans — the oracle states them as TRUE over group stats it
    * derives independently (the q58 HLL / q63 Misra-Gries discipline
    * applied to quantiles). */
  def q70ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val eps = 1.0 / 100 // accuracy=100
    val approx = l.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, array(0.5, 0.9), 100)").as("ap"))
      .select(col("l_returnflag"),
        col("ap").getItem(0).as("a50"), col("ap").getItem(1).as("a90"))
    // fencepost: the sketch guarantee is stated in integer-RANK terms, so
    // the real-valued targets (p±ε)·n are widened to ceil/floor before the
    // integer comparison — a strict real-valued bound would spuriously flip
    // FALSE when (p±ε)·n lands on an integer boundary (round-8 advisory)
    def okCols(p: Double, v: org.apache.spark.sql.Column, tag: String) = Seq(
      ((sum(when(col("l_quantity") < v, 1L).otherwise(0L)) + 1L) <=
        ceil(lit(p + eps) * count(lit(1)))).as(s"p${tag}_lo_ok"),
      (sum(when(col("l_quantity") <= v, 1L).otherwise(0L)) >=
        floor(lit(p - eps) * count(lit(1)))).as(s"p${tag}_hi_ok"))
    l.join(broadcast(approx), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        (okCols(0.5, col("a50"), "50") ++ okCols(0.9, col("a90"), "90")): _*)
  }

  val q70ApproxPercentileSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  TRUE AS p50_lo_ok, TRUE AS p50_hi_ok,
      |  TRUE AS p90_lo_ok, TRUE AS p90_hi_ok
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** Skew-salted aggregation gate ([[graft.ops.Skew.saltedSum]]): the
    * two-phase salted sum over a GENUINELY skewed grouping — 600k rows
    * over 3 return flags, exactly the hot-key shape where a single
    * reducer would absorb an entire group at cluster scale. Phase 1
    * groups by (key, salt) spreading each group over 32 reducers; phase
    * 2 folds the 32 partials. Summing integer cents keeps both phases
    * exact under any partitioning, so the salted result hash-matches the
    * oracle's plain GROUP BY — certifying the rewrite is identity on
    * semantics, which is the entire point of salting. */
  def q72SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    graft.ops.Skew.saltedSum(l, Seq("l_returnflag"), "cents")
      .select(col("l_returnflag"),
        (col("sum_cents").cast("double") / 100.0).as("total"),
        col("n_rows"))
  }

  val q72SaltedAggSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** Mergeable-HLL distinct-count gate (Apache DataSketches, the
    * `hll_sketch_agg` family — Spark's second, BINARY-SERIALIZABLE HLL
    * next to q58's `approx_count_distinct`): the property that matters
    * at 100 TB is MERGEABILITY — each ingest batch sketches itself
    * independently (here: one sketch per source), sketches persist as
    * small binaries, and the corpus-wide distinct count is a union of
    * sketches, never a re-scan of history (the q68 incremental-index
    * contract applied to cardinality). The gate certifies that BOTH the
    * single-pass estimate and the union-of-batch-sketches estimate sit
    * within 3.5σ of the exact count (σ = 1.04/√2¹² for lgK=12 ⇒ bound
    * 5.7%). The two estimates are NOT asserted equal: a sketch under
    * ~½k distinct items holds exact coupons (LIST/SET mode) while the
    * union's gadget densifies to HLL registers, so small-count merges
    * trade set-mode exactness for the standard HLL error — measured
    * live at sf0.01 (460 distinct: single-pass exact, union off by a
    * few). Sketch VALUES are merge-order-dependent binaries and never
    * hash-compare; the booleans do (the q70 sketch-gate discipline). */
  def q87HllMergeable(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(md5(col("text")).as("k"), col("source"))
    val perBatch = d.groupBy(col("source"))
      .agg(expr("hll_sketch_agg(k, 12)").as("sk"))
    val merged = perBatch
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
    val single = d.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(k, 12))").as("est_single"),
      count_distinct(col("k")).as("n_exact"))
    val bound = 3.5 * 1.04 / math.sqrt(1 << 12)
    def ok(est: org.apache.spark.sql.Column) =
      abs(est.cast("double") - col("n_exact")) <= lit(bound) * col("n_exact")
    single.crossJoin(broadcast(merged)).select(
      col("n_exact"),
      ok(col("est_single")).as("single_ok"),
      ok(col("est_merged")).as("merged_ok"))
  }

  val q87HllMergeableSql: String =
    """SELECT COUNT(DISTINCT md5(text)) AS n_exact,
      |  TRUE AS single_ok, TRUE AS merged_ok
      |FROM documents""".stripMargin

  /** q162: incremental corpus-stats artifact — the dataset-card numbers
    * maintained PER INGEST BATCH and merged, never recomputed: exact
    * additive fields (docs, tokens) plus a theta sketch of md5(text)
    * (distinct-content monitoring — dedup rate across batches) and a KLL
    * sketch of token counts (length distribution), one artifact row per
    * (batch, source). Three deterministic batches (doc_id % 3) stand in
    * for three ingests; the gate MERGES the nine artifact rows and
    * certifies the merged card against a full recompute: additive fields
    * by integer equality, theta by its exact-mode-collapsing 3σ bracket
    * (equality below capacity, ≥99.7% coverage above it), KLL median
    * by its proven rank bound. At 100 TB the left side of this equation
    * costs O(batch) per ingest and the merge costs kilobytes — that is
    * the entire point of mergeable summaries. */
  def q162IncrementalStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{KllFunctions, ThetaFunctions}
    val d = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      md5(col("text")).as("h"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    // per-(batch, source) artifact rows — each derivable from ONE ingest
    val art = d.withColumn("batch", col("doc_id") % 3)
      .groupBy(col("batch"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        ThetaFunctions.theta_sketch_agg(xxhash64(col("h")), 12).as("th"),
        KllFunctions.kll_sketch_agg(col("n_tok").cast("double"), 200).as("kll"))
    // merge across batches: additive longs + sketch unions, NO raw re-scan
    val merged = art.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        ThetaFunctions.theta_union_agg(col("th"), 12).as("th"),
        KllFunctions.kll_merge_agg(col("kll"), 200).as("kll"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        ThetaFunctions.theta_summary(col("th")).getItem(3).as("lb3"),
        ThetaFunctions.theta_summary(col("th")).getItem(4).as("ub3"),
        KllFunctions.kll_quantile(col("kll"), lit(0.5)).as("p50"))
    // full recompute — what the merge must reproduce
    val full = d.groupBy(col("source"))
      .agg(count(lit(1)).as("f_docs"), sum(col("n_tok")).as("f_tokens"),
        countDistinct(col("h")).as("f_distinct"),
        sort_array(collect_list(col("n_tok"))).as("lens"))
      .select(col("source"), col("f_docs"), col("f_tokens"), col("f_distinct"),
        element_at(col("lens"), ((size(col("lens")) + 1) / 2).cast("int"))
          .as("f_median_lo"),
        element_at(col("lens"), (size(col("lens")) / 2 + 1).cast("int"))
          .as("f_median_hi"))
    merged.join(full, "source").select(
      col("source"), col("n_docs"), col("n_tokens"),
      (col("n_docs") === col("f_docs") && col("n_tokens") === col("f_tokens"))
        .as("adds_exact"),
      // 3σ bracket, not hard equality: below nominal capacity the theta
      // bounds collapse to the estimate so this IS an exactness check;
      // past capacity (large SFs) it degrades to the proven ≥99.7%
      // bracket instead of flipping spuriously (round-11 advisory).
      (col("lb3") <= col("f_distinct").cast("double") &&
        col("f_distinct").cast("double") <= col("ub3"))
        .as("distinct_ok"),
      // KLL inclusive-rank median must land within the true middle band
      // widened by the proven ~1.65% (k=200) normalized rank error
      (col("p50") >= col("f_median_lo").cast("double") * 0.9 &&
        col("p50") <= col("f_median_hi").cast("double") * 1.1).as("p50_bounded"))
  }

  val q162IncrementalStatsSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  TRUE AS adds_exact, TRUE AS distinct_ok, TRUE AS p50_bounded
      |FROM documents GROUP BY source""".stripMargin

  /** q161: theta-sketch audience intersection — |A∩B| per event-type pair
    * via the PRINCIPLED set-operation sketch ([[graft.functions
    * .ThetaFunctions]]): where q111 compounds three HLL union errors
    * through inclusion–exclusion, the theta intersection carries its own
    * proven 2σ bounds, and below nominal capacity (lgK=12) it is EXACT.
    * One pass builds per-type sketches; the pair grid is types²; the
    * bounds-contract booleans are the q87 discipline (the oracle derives
    * the exact overlaps independently and every estimate must bracket
    * them). */
  def q161ThetaOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ThetaFunctions._
    val e = Tables.events(spark, dir)
    val sk = e.groupBy(col("event_type"))
      .agg(theta_sketch_agg(col("user_id"), 12).as("sk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        theta_summary(theta_intersect(col("a.sk"), col("b.sk"))).as("s"))
    val ui = e.select(col("event_type"), col("user_id")).distinct()
    val exact = ui.as("x").join(ui.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_exact"))
    pairs.join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("n_exact"),
        // 3σ bounds (exact-mode-collapsing): below capacity this asserts
        // exactness; in estimation mode it is a ≥99.7% bracket instead of
        // the flip-prone 2σ one (round-11 advisory)
        (col("s").getItem(3) <= col("n_exact") &&
          col("n_exact") <= col("s").getItem(4)).as("in_bounds"))
  }

  val q161ThetaOverlapSql: String =
    """WITH ui AS (SELECT DISTINCT event_type, user_id FROM events)
      |SELECT x.event_type AS type_a, y.event_type AS type_b,
      |  COUNT(*) AS n_exact, TRUE AS in_bounds
      |FROM ui x JOIN ui y
      |  ON y.user_id = x.user_id AND x.event_type < y.event_type
      |GROUP BY 1, 2""".stripMargin

  /** q111: sketch-based audience overlap — |A∩B| for every event-type
    * pair by inclusion–exclusion over HLL sketches (est_A + est_B −
    * est_union), the standard "shared users between surfaces" analytics
    * question answered WITHOUT a pairwise distinct-count job per cell.
    * The gate certifies each estimated overlap against the exact overlap
    * within the compounded HLL bound (3 estimates × 1.04·3.5/√2¹² each,
    * scaled by the union size — generous but honest). One pass builds the
    * per-type sketches; the pair grid is types². */
  def q111AudienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val sk = e.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        expr("hll_sketch_estimate(a.sk)").as("est_a"),
        expr("hll_sketch_estimate(b.sk)").as("est_b"),
        expr("hll_sketch_estimate(hll_union(a.sk, b.sk))").as("est_u"))
      .select(col("type_a"), col("type_b"),
        (col("est_a") + col("est_b") - col("est_u")).as("est_overlap"))
    val users = e.select(col("event_type"), col("user_id")).distinct()
    val exact = users.as("a")
      .join(users.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_exact"))
    val bound = 3 * 3.5 * 1.04 / math.sqrt(1 << 12)
    pairs.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        (abs(col("est_overlap") - coalesce(col("n_exact"), lit(0L))) <=
          lit(bound) * (col("est_overlap") + coalesce(col("n_exact"), lit(0L)) + 1))
          .as("within_bound"))
  }

  val q111AudienceOverlapSql: String =
    """WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  COUNT(*) AS n_exact, TRUE AS within_bound
      |FROM u a JOIN u b
      |  ON a.user_id = b.user_id AND a.event_type < b.event_type
      |GROUP BY 1, 2""".stripMargin

  /** q112: weighted median document length per source (weights =
    * n_chars): the "how long is the typical BYTE of this source" skew
    * statistic, exact via the cumulative-weight crossing rule (first
    * value whose running weight reaches half the total — integer
    * comparisons only, no interpolation). Windows partition by source, so
    * the sort parallelizes across sources; one corpus shuffle. */
  def q112WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
    val t = d.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("tokens"),
      col("n_chars").as("w"))
    val wOrd = Window.partitionBy(col("source"))
      .orderBy(col("tokens"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    val c = t.withColumn("cum", sum(col("w")).over(wOrd))
      .withColumn("tot", sum(col("w")).over(wAll))
      .filter(col("cum") * 2 >= col("tot"))
    c.groupBy(col("source"))
      .agg(min(col("tokens")).as("w_median_tokens"),
        first(col("tot")).as("total_chars"))
  }

  val q112WeightedMedianSql: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    n_chars AS w
      |  FROM documents),
      |c AS (
      |  SELECT source, tokens, w,
      |    SUM(w) OVER (PARTITION BY source ORDER BY tokens, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(w) OVER (PARTITION BY source) AS tot
      |  FROM t)
      |SELECT source, MIN(tokens) AS w_median_tokens,
      |  CAST(MIN(tot) AS BIGINT) AS total_chars
      |FROM c WHERE cum * 2 >= tot
      |GROUP BY source""".stripMargin

  /** q99: mergeable KLL quantile-sketch artifact
    * ([[graft.functions.KllFunctions]]) — the rank analogue of the q87 HLL
    * gate. Per-source sketches over document length are UNIONED (no raw
    * re-scan) and the merged estimates at p25/p50/p75/p95 are certified
    * against the corpus by their exact bracketing ranks: for target rank q
    * and estimate e, count(x < e) ≤ (q+ε)·n AND count(x ≤ e) ≥ (q−ε)·n,
    * with ε = 0.05 ≫ the k=200 theoretical ~1.65% @99% — tie-robust, so
    * the contract holds on discrete data where a single value carries
    * visible rank mass. The single-pass sketch is certified identically,
    * and the merged sketch's exact n must equal COUNT(*). */
  def q99KllQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KllFunctions._
    val x = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars").cast("double").as("x"))
    val merged = x.groupBy(col("source"))
      .agg(kll_sketch_agg(col("x"), 200).as("sk"))
      .agg(kll_merge_agg(col("sk"), 200).as("sk_m"))
    val single = x.agg(kll_sketch_agg(col("x"), 200).as("sk_s"))
    val ests = broadcast(merged).crossJoin(broadcast(single))
      .select(explode(array(Seq(0.25, 0.5, 0.75, 0.95).map(lit): _*)).as("q"),
        col("sk_m"), col("sk_s"))
      .select(col("q"),
        kll_quantile(col("sk_m"), col("q")).as("est_m"),
        kll_quantile(col("sk_s"), col("q")).as("est_s"),
        kll_sketch_n(col("sk_m")).as("sketch_n"))
    val eps = 0.05
    val ranks = x.crossJoin(broadcast(ests))
      .groupBy(col("q"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("x") < col("est_m"), 1L).otherwise(0L)).as("lt_m"),
        sum(when(col("x") <= col("est_m"), 1L).otherwise(0L)).as("le_m"),
        sum(when(col("x") < col("est_s"), 1L).otherwise(0L)).as("lt_s"),
        sum(when(col("x") <= col("est_s"), 1L).otherwise(0L)).as("le_s"),
        first(col("sketch_n")).as("sketch_n"))
    ranks.select(
      round(col("q") * 100).cast("long").as("q_fp2"),
      col("n"),
      (col("lt_m") <= (col("q") + eps) * col("n") &&
        col("le_m") >= (col("q") - eps) * col("n")).as("merged_ok"),
      (col("lt_s") <= (col("q") + eps) * col("n") &&
        col("le_s") >= (col("q") - eps) * col("n")).as("single_ok"),
      (col("sketch_n") === col("n")).as("n_ok"))
  }

  val q99KllQuantilesSql: String =
    """SELECT CAST(t.q_fp2 AS BIGINT) AS q_fp2,
      |  (SELECT COUNT(*) FROM documents) AS n,
      |  TRUE AS merged_ok, TRUE AS single_ok, TRUE AS n_ok
      |FROM (VALUES (25), (50), (75), (95)) t(q_fp2)""".stripMargin

  val q30MomentsSql: String =
    """WITH g AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_x,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_x2
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  sum_x / n AS mean_qty,
      |  (n * sum_x2 - sum_x * sum_x) / (n * (n - 1)) AS var_qty,
      |  sqrt((n * sum_x2 - sum_x * sum_x) / (n * (n - 1))) AS stddev_qty
      |FROM g""".stripMargin

  /** q140: rolling 7-day active users (DAU/WAU) by SKETCH COMPOSITION —
    * one HLL sketch per day, each day's WAU = union of its trailing 7
    * daily sketches. This is THE pattern that makes rolling distinct
    * counts tractable at 100 TB: the corpus is scanned once (daily
    * sketches are kilobytes), and every window estimate is a union of 7
    * binaries — where the exact form re-counts each user up to 7 times
    * across overlapping windows. Gate discipline = q87/q111: exact
    * counts are computed on both engines; the sketch estimates are
    * asserted within the 3.5σ HLL bound as booleans (estimates
    * themselves are merge-order-dependent and ungateable). */
  def q140RollingActive(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val daily = du.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
        count(lit(1)).as("dau_exact"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val off = spark.range(0, 7).select(col("id").cast("int").as("off"))
    // each day's sketch contributes to windows ending day..day+6; keep
    // only window-end days that exist in the corpus
    val contrib = daily.crossJoin(broadcast(off))
      .select(date_add(col("day"), col("off")).as("day"), col("sk"))
    val wauEst = contrib
      .join(daily.select(col("day")), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("wau_est"))
    val wauExact = du.crossJoin(broadcast(off))
      .select(date_add(col("day"), col("off")).as("day"), col("user_id"))
      .join(daily.select(col("day")), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("wau_exact"))
    val bound = 3.5 * 1.04 / math.sqrt(1 << 12)
    daily
      .select(col("day"), col("dau_exact"),
        expr("hll_sketch_estimate(sk)").as("dau_est"))
      .join(wauEst, Seq("day")).join(wauExact, Seq("day"))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau_exact"), col("wau_exact"),
        (abs(col("dau_est").cast("double") - col("dau_exact")) <=
          lit(bound) * col("dau_exact")).as("dau_ok"),
        (abs(col("wau_est").cast("double") - col("wau_exact")) <=
          lit(bound) * col("wau_exact")).as("wau_ok"))
  }

  val q140RollingActiveSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |dau AS (
      |  SELECT day, COUNT(DISTINCT user_id) AS dau_exact FROM du GROUP BY day),
      |wau AS (
      |  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau_exact
      |  FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY d.day)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day,
      |  dau.dau_exact, wau.wau_exact,
      |  TRUE AS dau_ok, TRUE AS wau_ok
      |FROM days d
      |JOIN dau ON dau.day = d.day
      |JOIN wau ON wau.day = d.day""".stripMargin

  /** q193: Count-Min sketch point queries (Cormode & Muthukrishnan
    * 2005) — the mergeable fixed-width frequency structure that
    * completes the sketch shelf (HLL q87 distincts, theta q161
    * intersections, KLL q99 ranks, Misra–Gries q63 heavy hitters):
    * depth 4 × width 1024 md5-derived counters over the corpus token
    * stream, probed for the exact top-20 tokens. The gate certifies the
    * two CMS contracts on every probe: `est ≥ exact` (counters only
    * over-count) and `est ≤ exact + ⌈e/w · N⌉` (the ε·N additive bound
    * at δ = e⁻⁴).
    *
    * Scale shape: the sketch is ONE 4,096-cell aggregate with map-side
    * combine — constant shuffle bytes regardless of corpus size, and
    * per-batch sketches ADD cell-wise (the q87/q99 mergeable-artifact
    * property). The probe side is 20 rows × 4 hashes joining a
    * 4,096-row table — both broadcast-sized. The exact top-20 pass
    * exists only to certify the estimates; production reads the sketch
    * alone. */
  def q193CmsFreq(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val depth = 4; val width = 1024
    // ONE tokenize pass, folded straight to exact per-token counts;
    // every other input — the CMS cells, the top-20 probes, the token
    // total — derives from the counts table. A CMS cell over the raw
    // stream is by definition the SUM of exact_ct over the tokens
    // hashing into it, so hashing the ~distinct-token table instead of
    // the token stream is value-identical while cutting the md5 mass
    // ~15× (stream tokens / distinct tokens) and the corpus scans 3→1.
    // The scan is spread past the single-row-group split so the
    // tokenize+count kernel isn't serialized on one task.
    val exact = Tables.spread(Tables.documents(spark, dir))
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("exact_ct"))
    val cms = exact
      .select(col("exact_ct"),
        posexplode(array((0 until depth).map(r =>
          graft.ops.TrainingMix.hex8(concat(col("tok"), lit(s"#cms$r"))) % width)
          : _*)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b")).agg(sum(col("exact_ct")).as("c"))
    val top = exact
      .withColumn("rn", row_number().over(
        Window.orderBy(col("exact_ct").desc, col("tok"))))
      .filter(col("rn") <= 20).drop("rn")
    val probes = top.select(col("tok"), col("exact_ct"),
      posexplode(array((0 until depth).map(r =>
        graft.ops.TrainingMix.hex8(concat(col("tok"), lit(s"#cms$r"))) % width)
        : _*)).as(Seq("r", "b")))
    val n = exact.agg(sum(col("exact_ct")).as("n_tokens"))
    probes.join(broadcast(cms), Seq("r", "b"))
      .groupBy(col("tok"), col("exact_ct"))
      .agg(min(col("c")).as("cms_est"))
      .crossJoin(broadcast(n))
      .select(col("tok"), col("exact_ct"), col("cms_est"),
        (col("cms_est") >= col("exact_ct")).as("overcount_ok"),
        (col("cms_est") <= col("exact_ct") +
          ceil(lit(math.E / 1024) * col("n_tokens")).cast("long"))
          .as("bound_ok"))
  }

  val q193CmsFreqSql: String = {
    import OracleFragments.hex8Sql
    def hashUnion(from: String, extra: String): String =
      (0 until 4).map(r =>
        s"SELECT $extra$r AS r, ${hex8Sql(s"tok || '#cms$r'")} % 1024 AS b FROM $from")
        .mkString("\n      |  UNION ALL ")
    s"""WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |tk AS (SELECT tok FROM toks WHERE tok <> ''),
      |cells AS (
      |  ${hashUnion("tk", "")}),
      |cms AS (SELECT r, b, COUNT(*) AS c FROM cells GROUP BY 1, 2),
      |exact AS (SELECT tok, COUNT(*) AS exact_ct FROM tk GROUP BY 1),
      |top AS (
      |  SELECT tok, exact_ct FROM (
      |    SELECT tok, exact_ct,
      |      row_number() OVER (ORDER BY exact_ct DESC, tok) AS rn
      |    FROM exact) WHERE rn <= 20),
      |probes AS (
      |  ${hashUnion("top", "tok, exact_ct, ")}),
      |est AS (
      |  SELECT p.tok, p.exact_ct, MIN(c.c) AS cms_est
      |  FROM probes p JOIN cms c ON c.r = p.r AND c.b = p.b
      |  GROUP BY 1, 2),
      |n AS (SELECT COUNT(*) AS n_tokens FROM tk)
      |SELECT tok, exact_ct, cms_est,
      |  cms_est >= exact_ct AS overcount_ok,
      |  cms_est <= exact_ct + CAST(ceil(${math.E / 1024} * n_tokens)
      |    AS BIGINT) AS bound_ok
      |FROM est CROSS JOIN n""".stripMargin
  }

  /** Cumulative Poisson(1) pmf thresholds in 2⁵² units — the replicate
    * weight is the Poisson quantile of the row's md5 uniform, so the
    * whole bootstrap is integer-threshold CASE logic: no float compare
    * at the decision boundary, identical in any engine. Capped at
    * w = 6 (P ≈ 6·10⁻⁵ tail, negligible for CI purposes). */
  private val poissonCumFp52: Seq[Long] = {
    var acc = 0.0; var fact = 1.0
    (0 to 5).map { k =>
      if (k > 0) fact *= k
      acc += math.exp(-1.0) / fact
      math.floor(acc * 4503599627370496.0).toLong
    }
  }

  /** q201: Poisson-bootstrap confidence intervals (the distributed
    * bootstrap: Chamandy et al. 2012, "Estimating uncertainty for
    * massive data streams") — B = 20 replicate means of `value` per
    * event type, each row weighted by an independent Poisson(1) draw
    * derived from md5(event_id:b). This is THE bootstrap shape that
    * scales: resampling-with-replacement needs global coordination,
    * Poisson weights are a pure per-row projection. CI = 2nd-smallest /
    * 2nd-largest replicate mean (a ~90% percentile interval at B = 20).
    *
    * Determinism: values fp6-quantize BEFORE weighting, weights are
    * integer CASE thresholds ([[poissonCumFp52]]), so replicate sums
    * are exact integers and each mean is one shared division; the CI
    * rank windows order integers. Scale shape: the B-fold explode is
    * the entire cost (B× rows into a (type × B)-group map-side-combined
    * aggregate); everything after is replicate-table-sized. */
  def q201PoissonBootstrap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nB = 20
    // spread BEFORE the B-fold explode: the replicate weights are one
    // md5 per (event, b) — 20× the corpus rows of hash kernel — and the
    // single-row-group scan would otherwise run all of it on ONE task
    // (profiled r19: the rep checkpoint job was 1.7 s serial vs ~0.15 s
    // spread; at real scale the scan has a task per row group and spread
    // is the identity)
    val e = Tables.spread(Tables.events(spark, dir).select(col("event_id"),
      col("event_type"), round(col("value") * lit(1e6)).cast("long").as("v6")))
    val h = graft.ops.TrainingMix.hex13(
      concat(col("event_id").cast("string"), lit(":"), col("b").cast("string")))
    val w = poissonCumFp52.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (t, k)) =>
        acc.when(h < t, lit(k.toLong))
      }.otherwise(lit(6L))
    val rep = e
      .select(col("event_id"), col("event_type"), col("v6"),
        explode(sequence(lit(0), lit(nB - 1))).as("b"))
      .select(col("event_type"), col("b"), w.as("w"), col("v6"))
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("v6")).as("sv"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      .select(col("event_type"), col("b"),
        round(col("sv").cast("double") / col("sw")).cast("long").as("mean6"))
      .localCheckpoint() // replicate table feeds point join + both rank cuts
    val point = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(round(col("value") * lit(1e6)).cast("long")).cast("double") /
          count(lit(1))).cast("long").as("mean_fp6"))
    val ranked = rep
      .withColumn("ra", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("mean6"), col("b"))))
      .withColumn("rd", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("mean6").desc, col("b").desc)))
    point
      .join(rep.groupBy(col("event_type")).agg(count(lit(1)).as("n_replicates")),
        Seq("event_type"))
      .join(ranked.filter(col("ra") === 2)
        .select(col("event_type"), col("mean6").as("boot_lo_fp6")), Seq("event_type"))
      .join(ranked.filter(col("rd") === 2)
        .select(col("event_type"), col("mean6").as("boot_hi_fp6")), Seq("event_type"))
  }

  val q201PoissonBootstrapSql: String = {
    // decode the 13-hex-char uniform from a PRE-MATERIALIZED md5 column:
    // the generic hex13Sql fragment inlines md5(e) once per hex digit,
    // and DuckDB's default CTE re-expansion would evaluate it 13× per
    // row × 20 replicates — the materialized two-step form computes each
    // md5 exactly once (identical value, 20× faster oracle)
    val decode = (1 to 13).map { i =>
      s"CAST(strpos('0123456789abcdef', substr(mh, $i, 1)) - 1 AS BIGINT)" +
        s" * ${1L << (4 * (13 - i))}"
    }.mkString(" + ")
    val cases = poissonCumFp52.zipWithIndex
      .map { case (t, k) => s"WHEN h < $t THEN $k" }.mkString("\n      |      ")
    s"""WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(round(value * 1e6) AS BIGINT) AS v6
      |  FROM events),
      |wm AS MATERIALIZED (
      |  SELECT event_type, r.b, v6, md5(event_id || ':' || r.b) AS mh
      |  FROM e CROSS JOIN range(20) r(b)),
      |wh AS MATERIALIZED (
      |  SELECT event_type, b, v6, $decode AS h FROM wm),
      |wb AS (
      |  SELECT event_type, b,
      |    CASE $cases
      |      ELSE 6 END AS w, v6
      |  FROM wh),
      |rep AS (
      |  SELECT event_type, b,
      |    CAST(round(CAST(SUM(w * v6) AS DOUBLE) / SUM(w)) AS BIGINT) AS mean6
      |  FROM wb GROUP BY 1, 2 HAVING SUM(w) > 0),
      |pt AS (
      |  SELECT event_type, COUNT(*) AS n_events,
      |    CAST(round(CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE)
      |      / COUNT(*)) AS BIGINT) AS mean_fp6
      |  FROM events GROUP BY 1),
      |rk AS (
      |  SELECT event_type, mean6,
      |    row_number() OVER (PARTITION BY event_type ORDER BY mean6, b) AS ra,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY mean6 DESC, b DESC) AS rd
      |  FROM rep),
      |nr AS (SELECT event_type, COUNT(*) AS n_replicates FROM rep GROUP BY 1)
      |SELECT p.event_type, p.n_events, p.mean_fp6, nr.n_replicates,
      |  lo.mean6 AS boot_lo_fp6, hi.mean6 AS boot_hi_fp6
      |FROM pt p
      |JOIN nr USING (event_type)
      |JOIN (SELECT event_type, mean6 FROM rk WHERE ra = 2) lo USING (event_type)
      |JOIN (SELECT event_type, mean6 FROM rk WHERE rd = 2) hi USING (event_type)""".stripMargin
  }

  /** q219: multi-feature OLS (extendedprice ~ quantity + discount) per
    * return flag, fitted in closed form from ONE aggregate pass. The
    * Gram/moment sums are exact Decimal(38,0) accumulators over the
    * 2-decimal fixed-point inputs (the q213 128-bit discipline), centered
    * second moments are formed in EXACT integer arithmetic
    * (M_ab = n·S_ab − S_a·S_b), and only the final 2×2 Cramer solve runs
    * in double — both engines start from identical integers and apply the
    * identical expression tree, so the fp6 outputs match bit-for-bit.
    *
    * Scale: this is the textbook distributed normal-equations fit — a
    * single map-side-combined aggregate over the fact table (no join, no
    * window, no driver collect; the k×k solve happens inside the plan as
    * per-group scalar arithmetic). At 100 TB the pass reads two measure
    * columns and one grouping column; cost is the scan.
    * Coefficients are in natural units (price per unit quantity /
    * per unit discount — the ×100 input scaling cancels in each slope);
    * the intercept is fp6 of price units.
    */
  def q219OlsRegression(spark: SparkSession, dir: String): DataFrame = {
    // the driver corpus is one row group → one scan task; the ten
    // Decimal(38) accumulators are the bottleneck, so spread the scan
    // (identity on any real multi-split table — Tables.spread contract)
    val li = Tables.spread(Tables.lineitem(spark, dir)).select(
      col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("q"),
      round(col("l_discount") * 100).cast("long").as("d"),
      round(col("l_extendedprice") * 100).cast("long").as("p"))
    def dsum(a: Column, b: Column) =
      sum(a.cast(DecimalType(38, 0)) * b.cast(DecimalType(38, 0)))
    def dsum1(a: Column) = sum(a.cast(DecimalType(38, 0)))
    val agg = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      dsum1(col("q")).as("sq"), dsum1(col("d")).as("sd"), dsum1(col("p")).as("sp"),
      dsum(col("q"), col("q")).as("sqq"), dsum(col("q"), col("d")).as("sqd"),
      dsum(col("d"), col("d")).as("sdd"), dsum(col("q"), col("p")).as("sqp"),
      dsum(col("d"), col("p")).as("sdp"), dsum(col("p"), col("p")).as("spp"))
    val nDec = col("n").cast(DecimalType(38, 0))
    def m(sab: Column, sa: Column, sb: Column) =
      (nDec * sab - sa * sb).cast("double")
    val mqq = m(col("sqq"), col("sq"), col("sq"))
    val mqd = m(col("sqd"), col("sq"), col("sd"))
    val mdd = m(col("sdd"), col("sd"), col("sd"))
    val mqp = m(col("sqp"), col("sq"), col("sp"))
    val mdp = m(col("sdp"), col("sd"), col("sp"))
    val mpp = m(col("spp"), col("sp"), col("sp"))
    val det = mqq * mdd - mqd * mqd
    val b1 = (mdd * mqp - mqd * mdp) / det
    val b2 = (mqq * mdp - mqd * mqp) / det
    // b0 is in the ×100 input space → ×1e4 yields fp6 of price units
    val b0 = (col("sp").cast("double") - b1 * col("sq").cast("double")
      - b2 * col("sd").cast("double")) / col("n").cast("double")
    val r2 = (b1 * mqp + b2 * mdp) / mpp
    agg.select(col("l_returnflag"), col("n").as("n_rows"),
      round(b1 * lit(1e6)).cast("long").as("b_qty_fp6"),
      round(b2 * lit(1e6)).cast("long").as("b_disc_fp6"),
      round(b0 * lit(1e4)).cast("long").as("b0_fp6"),
      round(r2 * lit(1e6)).cast("long").as("r2_fp6"))
  }

  val q219OlsRegressionSql: String =
    """WITH li AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS q,
      |    CAST(round(l_discount * 100) AS BIGINT) AS d,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(q AS HUGEINT)) AS sq, SUM(CAST(d AS HUGEINT)) AS sd,
      |    SUM(CAST(p AS HUGEINT)) AS sp,
      |    SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS sqq,
      |    SUM(CAST(q AS HUGEINT) * CAST(d AS HUGEINT)) AS sqd,
      |    SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS sdd,
      |    SUM(CAST(q AS HUGEINT) * CAST(p AS HUGEINT)) AS sqp,
      |    SUM(CAST(d AS HUGEINT) * CAST(p AS HUGEINT)) AS sdp,
      |    SUM(CAST(p AS HUGEINT) * CAST(p AS HUGEINT)) AS spp
      |  FROM li GROUP BY 1),
      |m AS (
      |  SELECT l_returnflag, n,
      |    CAST(n * sqq - sq * sq AS DOUBLE) AS mqq,
      |    CAST(n * sqd - sq * sd AS DOUBLE) AS mqd,
      |    CAST(n * sdd - sd * sd AS DOUBLE) AS mdd,
      |    CAST(n * sqp - sq * sp AS DOUBLE) AS mqp,
      |    CAST(n * sdp - sd * sp AS DOUBLE) AS mdp,
      |    CAST(n * spp - sp * sp AS DOUBLE) AS mpp,
      |    CAST(sq AS DOUBLE) AS sqf, CAST(sd AS DOUBLE) AS sdf,
      |    CAST(sp AS DOUBLE) AS spf
      |  FROM s),
      |b AS (
      |  SELECT l_returnflag, n, mqp, mdp, mpp, sqf, sdf, spf,
      |    (mdd * mqp - mqd * mdp) / (mqq * mdd - mqd * mqd) AS b1,
      |    (mqq * mdp - mqd * mqp) / (mqq * mdd - mqd * mqd) AS b2
      |  FROM m)
      |SELECT l_returnflag, n AS n_rows,
      |  CAST(round(b1 * 1e6) AS BIGINT) AS b_qty_fp6,
      |  CAST(round(b2 * 1e6) AS BIGINT) AS b_disc_fp6,
      |  CAST(round((spf - b1 * sqf - b2 * sdf) / CAST(n AS DOUBLE) * 1e4)
      |    AS BIGINT) AS b0_fp6,
      |  CAST(round((b1 * mqp + b2 * mdp) / mpp * 1e6) AS BIGINT) AS r2_fp6
      |FROM b""".stripMargin

  /** q247: per-row influence diagnostics for the q219 fit — hat values
    * (leverage) and Cook's distance, the data-valuation triad a
    * training-data pipeline runs to flag points that DOMINATE a fitted
    * model (mislabeled rows, corrupted measurements, adversarial
    * inserts) before they ship in a training mix. Closed form, two
    * passes, zero driver math:
    *
    *   pass 1 — the q219 Gram aggregate (exact Decimal(38,0) power
    *     sums per return flag);
    *   pass 2 — broadcast the 3-row group stats back and score every
    *     row: with centered integers U = n·qᵢ − Σq, V = n·dᵢ − Σd
    *     (exact), the hat value is
    *       hᵢ = 1/n + (mdd·U² − 2·mqd·U·V + mqq·V²)/(n·det)
    *     (the p=3 design's leverage — scale-free, so the ×100 input
    *     fixed-point cancels), the residual is
    *       eᵢ = (n·pᵢ − Σp − b1·U − b2·V)/n,
    *     and Cook's distance is Dᵢ = eᵢ²·hᵢ/(p·s²·(1−hᵢ)²) with
    *     s² = SSE/(n−p) from the same moments.
    *
    * Both engines form identical integers and apply the identical
    * double expression tree (the q219 discipline), so the fp6/fp9
    * outputs match exactly; Σround(hᵢ·10⁶) ≈ p·10⁶ is the built-in
    * self-check (trace of the hat matrix is exactly p). Cutoffs are
    * the textbook h > 2p/n and D > 4/n, compared as h·n > 6 and
    * D·n > 4 on identically-derived doubles.
    *
    * Scale: two map-side-combined passes over three fact columns —
    * one aggregate, one broadcast-join projection + re-aggregate. No
    * window, no driver collect; the 100 TB cost is two column scans
    * (or one, when the caller persists the projected integers). */
  def q247Leverage(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.spread(Tables.lineitem(spark, dir)).select(
      col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("q"),
      round(col("l_discount") * 100).cast("long").as("d"),
      round(col("l_extendedprice") * 100).cast("long").as("p"))
    def dsum(a: Column, b: Column) =
      sum(a.cast(DecimalType(38, 0)) * b.cast(DecimalType(38, 0)))
    def dsum1(a: Column) = sum(a.cast(DecimalType(38, 0)))
    val agg = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      dsum1(col("q")).as("sq"), dsum1(col("d")).as("sd"), dsum1(col("p")).as("sp"),
      dsum(col("q"), col("q")).as("sqq"), dsum(col("q"), col("d")).as("sqd"),
      dsum(col("d"), col("d")).as("sdd"), dsum(col("q"), col("p")).as("sqp"),
      dsum(col("d"), col("p")).as("sdp"), dsum(col("p"), col("p")).as("spp"))
    val nDec = col("n").cast(DecimalType(38, 0))
    def m(sab: Column, sa: Column, sb: Column) =
      (nDec * sab - sa * sb).cast("double")
    val stats = agg.select(
      col("l_returnflag"), col("n"), col("sq"), col("sd"), col("sp"),
      m(col("sqq"), col("sq"), col("sq")).as("mqq"),
      m(col("sqd"), col("sq"), col("sd")).as("mqd"),
      m(col("sdd"), col("sd"), col("sd")).as("mdd"),
      m(col("sqp"), col("sq"), col("sp")).as("mqp"),
      m(col("sdp"), col("sd"), col("sp")).as("mdp"),
      m(col("spp"), col("sp"), col("sp")).as("mpp"))
      .withColumn("det", col("mqq") * col("mdd") - col("mqd") * col("mqd"))
      .withColumn("b1",
        (col("mdd") * col("mqp") - col("mqd") * col("mdp")) / col("det"))
      .withColumn("b2",
        (col("mqq") * col("mdp") - col("mqd") * col("mqp")) / col("det"))
      .withColumn("s2",
        (col("mpp") - col("b1") * col("mqp") - col("b2") * col("mdp")) /
          col("n").cast("double") / (col("n").cast("double") - lit(3.0)))
    def cint(x: Column, s: Column) =
      (nDec * x.cast(DecimalType(38, 0)) - s).cast("double")
    val nd = col("n").cast("double")
    val scored = li.join(broadcast(stats), Seq("l_returnflag"))
      .withColumn("u", cint(col("q"), col("sq")))
      .withColumn("v", cint(col("d"), col("sd")))
      .withColumn("ee", cint(col("p"), col("sp")))
      .withColumn("h", lit(1.0) / nd +
        (col("mdd") * col("u") * col("u") -
          lit(2.0) * col("mqd") * col("u") * col("v") +
          col("mqq") * col("v") * col("v")) / (nd * col("det")))
      .withColumn("e",
        (col("ee") - col("b1") * col("u") - col("b2") * col("v")) / nd)
      .withColumn("cooks",
        (col("e") * col("e") * col("h")) /
          (lit(3.0) * col("s2") * (lit(1.0) - col("h")) * (lit(1.0) - col("h"))))
    scored.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("h") * lit(1e6)).cast("long")).as("sum_h_fp6"),
        max(round(col("h") * lit(1e9)).cast("long")).as("max_h_fp9"),
        sum(when(col("h") * nd > lit(6.0), 1L).otherwise(0L))
          .as("n_high_leverage"),
        max(round(col("cooks") * lit(1e9)).cast("long")).as("max_cooks_fp9"),
        sum(when(col("cooks") * nd > lit(4.0), 1L).otherwise(0L))
          .as("n_influential"))
  }

  val q247LeverageSql: String =
    """WITH li AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS q,
      |    CAST(round(l_discount * 100) AS BIGINT) AS d,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(q AS HUGEINT)) AS sq, SUM(CAST(d AS HUGEINT)) AS sd,
      |    SUM(CAST(p AS HUGEINT)) AS sp,
      |    SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS sqq,
      |    SUM(CAST(q AS HUGEINT) * CAST(d AS HUGEINT)) AS sqd,
      |    SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS sdd,
      |    SUM(CAST(q AS HUGEINT) * CAST(p AS HUGEINT)) AS sqp,
      |    SUM(CAST(d AS HUGEINT) * CAST(p AS HUGEINT)) AS sdp,
      |    SUM(CAST(p AS HUGEINT) * CAST(p AS HUGEINT)) AS spp
      |  FROM li GROUP BY 1),
      |m AS (
      |  SELECT l_returnflag, n, sq, sd, sp,
      |    CAST(n * sqq - sq * sq AS DOUBLE) AS mqq,
      |    CAST(n * sqd - sq * sd AS DOUBLE) AS mqd,
      |    CAST(n * sdd - sd * sd AS DOUBLE) AS mdd,
      |    CAST(n * sqp - sq * sp AS DOUBLE) AS mqp,
      |    CAST(n * sdp - sd * sp AS DOUBLE) AS mdp,
      |    CAST(n * spp - sp * sp AS DOUBLE) AS mpp
      |  FROM s),
      |c AS (
      |  SELECT *, mqq * mdd - mqd * mqd AS det FROM m),
      |c2 AS (
      |  SELECT *,
      |    (mdd * mqp - mqd * mdp) / det AS b1,
      |    (mqq * mdp - mqd * mqp) / det AS b2
      |  FROM c),
      |c3 AS (
      |  SELECT *,
      |    (mpp - b1 * mqp - b2 * mdp) / CAST(n AS DOUBLE)
      |      / (CAST(n AS DOUBLE) - 3.0) AS s2
      |  FROM c2),
      |sc AS (
      |  SELECT li.l_returnflag, CAST(c.n AS DOUBLE) AS nd,
      |    c.mqq, c.mqd, c.mdd, c.det, c.b1, c.b2, c.s2,
      |    CAST(CAST(c.n AS HUGEINT) * li.q - c.sq AS DOUBLE) AS u,
      |    CAST(CAST(c.n AS HUGEINT) * li.d - c.sd AS DOUBLE) AS v,
      |    CAST(CAST(c.n AS HUGEINT) * li.p - c.sp AS DOUBLE) AS ee
      |  FROM li JOIN c3 c USING (l_returnflag)),
      |hh AS (
      |  SELECT l_returnflag, nd, s2,
      |    1.0 / nd + (mdd * u * u - 2.0 * mqd * u * v + mqq * v * v)
      |      / (nd * det) AS h,
      |    (ee - b1 * u - b2 * v) / nd AS e
      |  FROM sc),
      |ck AS (
      |  SELECT l_returnflag, nd, h,
      |    (e * e * h) / (3.0 * s2 * (1.0 - h) * (1.0 - h)) AS cooks
      |  FROM hh)
      |SELECT l_returnflag, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(round(h * 1e6) AS BIGINT)) AS BIGINT) AS sum_h_fp6,
      |  MAX(CAST(round(h * 1e9) AS BIGINT)) AS max_h_fp9,
      |  CAST(SUM(CASE WHEN h * nd > 6.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_high_leverage,
      |  MAX(CAST(round(cooks * 1e9) AS BIGINT)) AS max_cooks_fp9,
      |  CAST(SUM(CASE WHEN cooks * nd > 4.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_influential
      |FROM ck GROUP BY 1""".stripMargin

  /** q223: stratified inverse-propensity ATE estimate — treatment =
    * urgent/high order priority, outcome = order total (cents),
    * confounder strata = customer market segment. With a DISCRETE
    * confounder, the IPW estimator with exact per-stratum propensities
    * e_x = n_t(x)/n(x) reduces ALGEBRAICALLY to the n_x/N-weighted
    * within-stratum difference of means — computed here in that
    * identical, division-stable form. Strata where the propensity is
    * degenerate (0 or 1) are excluded on both sides, per the positivity
    * assumption. Per-stratum difference of means is fp6-rounded BEFORE
    * the overall weighting so the cross-stratum combine is exact integer
    * arithmetic (order-free across engines).
    *
    * Scale: one fact–dim equi-join (AQE broadcasts the segment dim when
    * it fits; shuffles on the key otherwise) into a 5-row aggregate; the
    * overall-ATE window runs on that 5-row table. No other shuffle.
    */
  def q223IpwAte(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select(col("o_custkey"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("t"),
      round(col("o_totalprice") * 100).cast("long").as("y"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val s = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_x"), sum(col("t")).as("n_t"),
        sum(when(col("t") === 1, col("y")).otherwise(0L)).as("yt"),
        sum(when(col("t") === 0, col("y")).otherwise(0L)).as("yc"))
      .filter(col("n_t") > 0 && col("n_t") < col("n_x"))
    val dm = col("yt").cast("double") / col("n_t").cast("double") -
      col("yc").cast("double") / (col("n_x") - col("n_t")).cast("double")
    val wAll = Window.partitionBy()
    s.select(col("c_mktsegment"), col("n_x"), col("n_t"),
        round(lit(1e6) * col("n_t").cast("double") /
          col("n_x").cast("double")).cast("long").as("e_fp6"),
        round(dm * lit(1e6)).cast("long").as("dm_fp6"))
      .withColumn("ate_fp6",
        round(sum(col("n_x") * col("dm_fp6")).over(wAll).cast("double") /
          sum(col("n_x")).over(wAll).cast("double")).cast("long"))
  }

  val q223IpwAteSql: String =
    """WITH j AS (
      |  SELECT c.c_mktsegment,
      |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END AS t,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |s AS (
      |  SELECT c_mktsegment, COUNT(*) AS n_x, CAST(SUM(t) AS BIGINT) AS n_t,
      |    SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS yt,
      |    SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS yc
      |  FROM j GROUP BY 1),
      |d AS (
      |  SELECT c_mktsegment, n_x, n_t,
      |    CAST(round(1e6 * CAST(n_t AS DOUBLE) / CAST(n_x AS DOUBLE))
      |      AS BIGINT) AS e_fp6,
      |    CAST(round((CAST(yt AS DOUBLE) / CAST(n_t AS DOUBLE)
      |      - CAST(yc AS DOUBLE) / CAST(n_x - n_t AS DOUBLE)) * 1e6)
      |      AS BIGINT) AS dm_fp6
      |  FROM s WHERE n_t > 0 AND n_t < n_x)
      |SELECT c_mktsegment, n_x, n_t, e_fp6, dm_fp6,
      |  CAST(round(CAST(SUM(n_x * dm_fp6) OVER () AS DOUBLE)
      |    / CAST(SUM(n_x) OVER () AS DOUBLE)) AS BIGINT) AS ate_fp6
      |FROM d""".stripMargin

  /** q238: Cochran–Mantel–Haenszel pooled odds ratio across market-
    * segment strata — treatment = urgent/high priority, outcome =
    * finished order status. The CMH estimator Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ)
    * pools 2×2 tables WITHOUT assuming a common baseline rate — the
    * stratified counterpart to q212's marginal χ² and the odds-scale
    * sibling of q223's ATE. Per-stratum numerator/denominator terms are
    * fp9-rounded (exact-integer cell counts in, integers out), so the
    * cross-stratum sums are order-free; strata with an empty cell are
    * excluded on both sides (the estimator is undefined there).
    *
    * Scale: one fact–dim join into a strata-sized 2×2 grid; everything
    * after is arithmetic on ≤ strata rows.
    */
  def q238CmhOddsRatio(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select(col("o_custkey"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("t"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    def cell(t: Long, y: Long) =
      sum(when(col("t") === t && col("y") === y, 1L).otherwise(0L))
    val s = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(cell(1, 1).as("a"), cell(1, 0).as("b"),
        cell(0, 1).as("cc"), cell(0, 0).as("d"))
      .filter(col("a") > 0 && col("b") > 0 && col("cc") > 0 && col("d") > 0)
    val n = (col("a") + col("b") + col("cc") + col("d")).cast("double")
    val num9 = round(lit(1e9) * col("a").cast("double") *
      col("d").cast("double") / n).cast("long")
    val den9 = round(lit(1e9) * col("b").cast("double") *
      col("cc").cast("double") / n).cast("long")
    val orS = round(lit(1e6) * col("a").cast("double") *
      col("d").cast("double") /
      (col("b").cast("double") * col("cc").cast("double"))).cast("long")
    val wAll = Window.partitionBy()
    s.select(col("c_mktsegment"), col("a"), col("b"), col("cc"), col("d"),
        orS.as("or_fp6"), num9.as("n9"), den9.as("d9"))
      .withColumn("cmh_or_fp6",
        round(lit(1e6) * sum(col("n9")).over(wAll).cast("double") /
          sum(col("d9")).over(wAll).cast("double")).cast("long"))
      .drop("n9", "d9")
  }

  val q238CmhOddsRatioSql: String =
    """WITH j AS (
      |  SELECT c.c_mktsegment,
      |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END AS t,
      |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |s AS (
      |  SELECT c_mktsegment,
      |    CAST(SUM(CASE WHEN t = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN t = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN t = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cc,
      |    CAST(SUM(CASE WHEN t = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM j GROUP BY 1),
      |f AS (
      |  SELECT c_mktsegment, a, b, cc, d,
      |    CAST(round(1e6 * CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
      |      / (CAST(b AS DOUBLE) * CAST(cc AS DOUBLE))) AS BIGINT) AS or_fp6,
      |    CAST(round(1e9 * CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
      |      / CAST(a + b + cc + d AS DOUBLE)) AS BIGINT) AS n9,
      |    CAST(round(1e9 * CAST(b AS DOUBLE) * CAST(cc AS DOUBLE)
      |      / CAST(a + b + cc + d AS DOUBLE)) AS BIGINT) AS d9
      |  FROM s WHERE a > 0 AND b > 0 AND cc > 0 AND d > 0)
      |SELECT c_mktsegment, a, b, cc, d, or_fp6,
      |  CAST(round(1e6 * CAST(SUM(n9) OVER () AS DOUBLE)
      |    / CAST(SUM(d9) OVER () AS DOUBLE)) AS BIGINT) AS cmh_or_fp6
      |FROM f""".stripMargin

  /** q232: delete-one-group jackknife standard error of the mean purchase
    * value, grouped by user (the unit of dependence — events of one user
    * are correlated, so the i.i.d. bootstrap under-covers; the grouped
    * jackknife is the standard fix). Each leave-user-out estimate
    * θ₍ᵤ₎ = (S − s_u)/(N − n_u) comes from exact integer totals, is
    * fp6-rounded (order-free), and the variance of the G pseudo-values
    * uses exact Decimal(38,0) moment sums; the delete-one-group
    * jackknife variance is (G−1)/G · Σ(θ₍ᵤ₎ − θ̄₍·₎)² — in moment form
    * (G−1)/G · (G·s2 − s1²)/G — and SE is its square root. (Round 13
    * shipped an extra /G here, understating SE ~√G-fold; the oracle and
    * spec mirrored the same expression, which is why the cross-engine
    * hash could not catch it — the spec now re-derives the variance
    * from the deviation form instead of the moment form.)
    *
    * Scale: one corpus aggregate to per-user (s_u, n_u) + one scalar
    * total broadcast back — the θ₍ᵤ₎ table is users-sized and never
    * re-touches the corpus. Contrast with q201's Poisson bootstrap
    * (row-level replicates): same inference goal, G-fold cheaper.
    */
  def q232Jackknife(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        round(col("value") * lit(1e6)).cast("long").as("v6"))
    val perUser = p.groupBy(col("user_id"))
      .agg(sum(col("v6")).as("s_u"), count(lit(1)).as("n_u"))
    val tot = perUser.agg(sum(col("s_u")).as("ss"), sum(col("n_u")).as("nn"),
      count(lit(1)).as("gg"))
    val theta6 = round((col("ss") - col("s_u")).cast("double") /
      (col("nn") - col("n_u")).cast("double")).cast("long")
    val pseudo = perUser.crossJoin(broadcast(tot))
      .select(col("ss"), col("nn"), col("gg"), theta6.as("t6"))
    pseudo.groupBy(col("gg"))
      .agg(max(col("ss")).as("ss"), max(col("nn")).as("nn"),
        sum(col("t6").cast(DecimalType(38, 0))).as("s1"),
        sum(col("t6").cast(DecimalType(38, 0)) *
          col("t6").cast(DecimalType(38, 0))).as("s2"))
      .select(col("gg").as("n_groups"), col("nn").as("n_events"),
        round(col("ss").cast("double") / col("nn").cast("double"))
          .cast("long").as("theta_fp6"),
        round(sqrt(
          (col("gg").cast(DecimalType(38, 0)) * col("s2") -
            col("s1") * col("s1")).cast("double") /
          col("gg").cast("double") *
          ((col("gg").cast("double") - 1.0) / col("gg").cast("double"))))
          .cast("long").as("jk_se_fp6"))
  }

  /** q237: CUPED variance reduction (Deng et al. 2013) for the A/B
    * comparison of mean purchase value: each user's PRE-period (first 14
    * days) mean is the covariate X, the post-period mean is the metric Y;
    * θ = cov(X,Y)/var(X) is fitted on the pooled user grid (exact
    * Decimal moments over fp6-rounded per-user means — the q219 centered-
    * moment discipline), and the adjusted metric Y′ = Y − θ(X − X̄) is
    * fp6-rounded per user before the treated/control means and the
    * variance-ratio — so every cross-user reduction is exact-integer.
    * Reports the unadjusted and CUPED deltas plus var(Y′)/var(Y), the
    * number that says how much experiment runtime the covariate buys.
    *
    * Scale: two corpus aggregates to the per-user grid (partitioned by
    * user_id), then users-sized arithmetic; θ and X̄ broadcast back as
    * 1-row grids. No corpus re-touch, no window.
    */
  def q237Cuped(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val base = e.filter(col("event_type") === "purchase")
      .crossJoin(broadcast(minDay))
      .select(col("user_id"),
        (datediff(to_date(col("ts")), col("d0")) >= 14).as("post"),
        round(col("value") * lit(1e6)).cast("long").as("v6"))
    val perUser = base.groupBy(col("user_id")).agg(
        sum(when(!col("post"), col("v6")).otherwise(0L)).as("s_pre"),
        sum(when(!col("post"), 1L).otherwise(0L)).as("n_pre"),
        sum(when(col("post"), col("v6")).otherwise(0L)).as("s_post"),
        sum(when(col("post"), 1L).otherwise(0L)).as("n_post"))
      .filter(col("n_pre") > 0 && col("n_post") > 0)
      .select(col("user_id"), (col("user_id") % 2 === 1).as("t"),
        round(col("s_pre").cast("double") / col("n_pre").cast("double"))
          .cast("long").as("x6"),
        round(col("s_post").cast("double") / col("n_post").cast("double"))
          .cast("long").as("y6"))
      .localCheckpoint() // users-sized grid; feeds θ fit + adjustment
    def d38(c: Column) = c.cast(DecimalType(38, 0))
    val mom = perUser.agg(count(lit(1)).as("n"),
      sum(d38(col("x6"))).as("sx"), sum(d38(col("y6"))).as("sy"),
      sum(d38(col("x6")) * d38(col("x6"))).as("sxx"),
      sum(d38(col("x6")) * d38(col("y6"))).as("sxy"))
    val nDec = col("n").cast(DecimalType(38, 0))
    val theta = (nDec * col("sxy") - col("sx") * col("sy")).cast("double") /
      (nDec * col("sxx") - col("sx") * col("sx")).cast("double")
    val thetaDf = mom.select(col("n"), theta.as("th"),
      (col("sx").cast("double") / col("n").cast("double")).as("mx"))
    val adj = perUser.crossJoin(broadcast(thetaDf))
      .select(col("t"), col("y6"), col("n"), col("th"),
        round(col("y6").cast("double") - col("th") *
          (col("x6").cast("double") - col("mx"))).cast("long").as("a6"))
    adj.groupBy(col("n"), col("th")).agg(
        sum(when(col("t"), col("y6")).otherwise(0L)).as("syt"),
        sum(when(col("t"), 1L).otherwise(0L)).as("nt"),
        sum(when(!col("t"), col("y6")).otherwise(0L)).as("syc"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("nc"),
        sum(when(col("t"), col("a6")).otherwise(0L)).as("sat"),
        sum(when(!col("t"), col("a6")).otherwise(0L)).as("sac"),
        sum(d38(col("y6"))).as("sy"),
        sum(d38(col("y6")) * d38(col("y6"))).as("syy"),
        sum(d38(col("a6"))).as("sa"),
        sum(d38(col("a6")) * d38(col("a6"))).as("saa"))
      .select(col("n").as("n_users"),
        round(col("th") * lit(1e6)).cast("long").as("theta_fp6"),
        round(col("syt").cast("double") / col("nt").cast("double") -
          col("syc").cast("double") / col("nc").cast("double"))
          .cast("long").as("dm_raw_fp6"),
        round(col("sat").cast("double") / col("nt").cast("double") -
          col("sac").cast("double") / col("nc").cast("double"))
          .cast("long").as("dm_cuped_fp6"),
        round(lit(1e6) *
          (col("n").cast(DecimalType(38, 0)) * col("saa") -
            col("sa") * col("sa")).cast("double") /
          (col("n").cast(DecimalType(38, 0)) * col("syy") -
            col("sy") * col("sy")).cast("double"))
          .cast("long").as("vr_fp6"))
  }

  val q237CupedSql: String =
    """WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |base AS (
      |  SELECT user_id,
      |    date_diff('day', d0.d0, ts::DATE) >= 14 AS post,
      |    CAST(round(value * 1e6) AS BIGINT) AS v6
      |  FROM events, d0 WHERE event_type = 'purchase'),
      |pu AS (
      |  SELECT user_id, user_id % 2 = 1 AS t,
      |    CAST(round(CAST(SUM(CASE WHEN NOT post THEN v6 ELSE 0 END)
      |        AS DOUBLE)
      |      / CAST(SUM(CASE WHEN NOT post THEN 1 ELSE 0 END) AS DOUBLE))
      |      AS BIGINT) AS x6,
      |    CAST(round(CAST(SUM(CASE WHEN post THEN v6 ELSE 0 END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN post THEN 1 ELSE 0 END) AS DOUBLE))
      |      AS BIGINT) AS y6
      |  FROM base GROUP BY 1
      |  HAVING SUM(CASE WHEN NOT post THEN 1 ELSE 0 END) > 0
      |    AND SUM(CASE WHEN post THEN 1 ELSE 0 END) > 0),
      |mom AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CAST(x6 AS HUGEINT)) AS sx, SUM(CAST(y6 AS HUGEINT)) AS sy,
      |    SUM(CAST(x6 AS HUGEINT) * CAST(x6 AS HUGEINT)) AS sxx,
      |    SUM(CAST(x6 AS HUGEINT) * CAST(y6 AS HUGEINT)) AS sxy
      |  FROM pu),
      |th AS (
      |  SELECT n,
      |    CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE) AS th,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
      |  FROM mom),
      |adj AS (
      |  SELECT pu.t, pu.y6, th.n, th.th,
      |    CAST(round(CAST(pu.y6 AS DOUBLE)
      |      - th.th * (CAST(pu.x6 AS DOUBLE) - th.mx)) AS BIGINT) AS a6
      |  FROM pu, th),
      |agg AS (
      |  SELECT n, th,
      |    CAST(SUM(CASE WHEN t THEN y6 ELSE 0 END) AS BIGINT) AS syt,
      |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
      |    CAST(SUM(CASE WHEN NOT t THEN y6 ELSE 0 END) AS BIGINT) AS syc,
      |    CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(SUM(CASE WHEN t THEN a6 ELSE 0 END) AS BIGINT) AS sat,
      |    CAST(SUM(CASE WHEN NOT t THEN a6 ELSE 0 END) AS BIGINT) AS sac,
      |    SUM(CAST(y6 AS HUGEINT)) AS sy,
      |    SUM(CAST(y6 AS HUGEINT) * CAST(y6 AS HUGEINT)) AS syy,
      |    SUM(CAST(a6 AS HUGEINT)) AS sa,
      |    SUM(CAST(a6 AS HUGEINT) * CAST(a6 AS HUGEINT)) AS saa
      |  FROM adj GROUP BY 1, 2)
      |SELECT n AS n_users,
      |  CAST(round(th * 1e6) AS BIGINT) AS theta_fp6,
      |  CAST(round(CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
      |    - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE)) AS BIGINT)
      |    AS dm_raw_fp6,
      |  CAST(round(CAST(sat AS DOUBLE) / CAST(nt AS DOUBLE)
      |    - CAST(sac AS DOUBLE) / CAST(nc AS DOUBLE)) AS BIGINT)
      |    AS dm_cuped_fp6,
      |  CAST(round(1e6 * CAST(n * saa - sa * sa AS DOUBLE)
      |    / CAST(n * syy - sy * sy AS DOUBLE)) AS BIGINT) AS vr_fp6
      |FROM agg""".stripMargin

  val q232JackknifeSql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(round(value * 1e6) AS BIGINT) AS v6
      |  FROM events WHERE event_type = 'purchase'),
      |u AS (
      |  SELECT user_id, CAST(SUM(v6) AS BIGINT) AS s_u, COUNT(*) AS n_u
      |  FROM p GROUP BY 1),
      |t AS (
      |  SELECT CAST(SUM(s_u) AS BIGINT) AS ss, CAST(SUM(n_u) AS BIGINT) AS nn,
      |    COUNT(*) AS gg
      |  FROM u),
      |ps AS (
      |  SELECT t.ss, t.nn, t.gg,
      |    CAST(round(CAST(t.ss - u.s_u AS DOUBLE)
      |      / CAST(t.nn - u.n_u AS DOUBLE)) AS BIGINT) AS t6
      |  FROM u, t),
      |m AS (
      |  SELECT gg, MAX(ss) AS ss, MAX(nn) AS nn,
      |    SUM(CAST(t6 AS HUGEINT)) AS s1,
      |    SUM(CAST(t6 AS HUGEINT) * CAST(t6 AS HUGEINT)) AS s2
      |  FROM ps GROUP BY 1)
      |SELECT gg AS n_groups, nn AS n_events,
      |  CAST(round(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)) AS BIGINT)
      |    AS theta_fp6,
      |  CAST(round(sqrt(
      |    CAST(gg * s2 - s1 * s1 AS DOUBLE)
      |    / CAST(gg AS DOUBLE)
      |    * ((CAST(gg AS DOUBLE) - 1.0) / CAST(gg AS DOUBLE))))
      |    AS BIGINT) AS jk_se_fp6
      |FROM m""".stripMargin
}
