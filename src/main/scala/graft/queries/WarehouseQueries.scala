package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.warehouse.Scd2

/** Warehouse-semantics gates: SCD2 history + point-in-time, and
  * sketch-accuracy bounds.
  */
object WarehouseQueries {

  private val D1 = "1997-01-01"
  private val D2 = "1999-01-01"
  private val D3 = "2001-01-01"
  private val Pit = "2000-06-15"

  /** Per-customer order counts as of (strictly before) EVERY snapshot
    * date, from ONE scan: conditional aggregation replaces one
    * scan+shuffle per date — the shape a real SCD2 backfill uses (k
    * generations from one pass over the fact table, not k passes). */
  private def snapshots(spark: SparkSession, dir: String,
      dates: Seq[String]): Seq[DataFrame] = {
    val o = Tables.orders(spark, dir)
    val aggs = dates.zipWithIndex.map { case (d, i) =>
      count(when(col("o_orderdate").cast("date") < to_date(lit(d)), 1)).as(s"n_$i")
    }
    val all = o.groupBy(col("o_custkey")).agg(aggs.head, aggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dates.indices.map { i =>
      // a customer enters snapshot i only once they have orders before d_i
      // (count-when yields 0 where the per-date groupBy had no row)
      all.filter(col(s"n_$i") > 0)
        .select(col("o_custkey"), col(s"n_$i").as("n_orders"))
    }
  }

  /** SCD2 gate: init at D1, merge snapshots at D2 and D3, read the history
    * as of a date between D2 and D3. The oracle derives the same rows
    * independently from first principles: the valid version at Pit is the
    * D2 snapshot value, with `valid_from` = D1 when the value was already
    * the same at D1 (merge kept the open row) else D2 — certifying both
    * [[Scd2.merge]]'s keep/close/new-version split and [[Scd2.asOf]]'s
    * interval predicate against an engine that never ran the merge. */
  def q57Scd2Pit(spark: SparkSession, dir: String): DataFrame = {
    // persist the LAST pre-consumer generation (h1): merge consumes its
    // input history in two branches (open/closed filters), so an
    // unpersisted chain re-evaluates the previous generation's lineage
    // per branch — with k merges that is 2^k scans of the base snapshots.
    // h0 deliberately has NO barrier: re-deriving init from the cached
    // snapshot frame is one cheap filter, while a persist pays a full
    // materialization barrier (measured at sf0.1: all+h1 0.49-0.57 s vs
    // all+h0+h1 0.56-0.71 s steady-state — the r7 1.79 s regression was
    // exactly over-persisting). In production the history is a TABLE
    // between loads (write/read breaks the lineage the same way).
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val Seq(s1, s2, s3) = snapshots(spark, dir, Seq(D1, D2, D3))
    val h0 = Scd2.init(s1, D1)
    val h1 = Scd2.merge(h0, s2, "o_custkey", D2).persist(mem)
    val h2 = Scd2.merge(h1, s3, "o_custkey", D3)
    Scd2.asOf(h2, Pit)
      .select(col("o_custkey").as("custkey"), col("n_orders"),
        col("valid_from"))
  }

  val q57Scd2PitSql: String =
    s"""WITH s1 AS (
      |  SELECT o_custkey, COUNT(*) AS n FROM orders
      |  WHERE o_orderdate < DATE '$D1' GROUP BY 1),
      |s2 AS (
      |  SELECT o_custkey, COUNT(*) AS n FROM orders
      |  WHERE o_orderdate < DATE '$D2' GROUP BY 1)
      |SELECT s2.o_custkey AS custkey, s2.n AS n_orders,
      |  CASE WHEN s1.n IS NOT NULL AND s1.n = s2.n
      |       THEN '$D1' ELSE '$D2' END AS valid_from
      |FROM s2 LEFT JOIN s1 ON s1.o_custkey = s2.o_custkey""".stripMargin

  /** Sketch-accuracy gate: HLL++ approximate distinct customers per order
    * priority, asserted within 3× the configured relative error of the
    * exact count — emitted as a boolean the oracle states as TRUE next to
    * the exact count it recomputes. HLL registers merge by bitwise max
    * (commutative, associative), so the approximate value is
    * deterministic for a given dataset regardless of partition or merge
    * order — gate-safe where a GK-quantile sketch would not be. */
  def q58ApproxBounds(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_exact"),
        approx_count_distinct(col("o_custkey"), 0.05).as("__approx"))
      .select(col("o_orderpriority"), col("n_exact"),
        (abs(col("__approx") - col("n_exact")).cast("double") /
          col("n_exact") <= 0.15).as("hll_ok"))

  val q58ApproxBoundsSql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact,
      |  TRUE AS hll_ok
      |FROM orders GROUP BY 1""".stripMargin

  /** Misra-Gries heavy hitters over the document token stream, k = 30 —
    * one LESS than the corpus vocabulary (31), so counter eviction and
    * the lossy partial-merge path genuinely run. The gate checks the
    * sketch's deterministic THEOREM (not a probabilistic bound, so exact
    * even though the summary's contents depend on partial-aggregation
    * order): every token with true count > N/(k+1) must be present, never
    * overcounted, and undercounted by at most N/(k+1). The oracle states
    * those facts as TRUE literals over the exact counts. */
  def q63HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 30
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    // ONE pass: the sketch buffer carries the exact processed count, so N
    // no longer costs a separate full token scan (round-6 wrong #2)
    val (mg, total) = graft.ops.Approx.heavyHittersWithCount(
      toks.select(col("tok")).as[String], k)
    val bound = total / (k + 1).toDouble
    // sketch result: ≤ k entries to the driver — sketch output is
    // driver-sized by design; re-broadcast as a tiny lookup side
    val mgDf = mg.toSeq.toDF("tok", "est")
    toks.groupBy(col("tok")).agg(count(lit(1)).as("n_true"))
      .filter(col("n_true") > lit(bound))
      .join(broadcast(mgDf), Seq("tok"), "left")
      .select(col("tok"), col("n_true"),
        col("est").isNotNull.as("found"),
        (col("est").isNotNull && col("est") <= col("n_true") &&
          (col("n_true") - col("est")) <= lit(bound)).as("bounded"))
  }

  val q63HeavyHittersSql: String =
    """WITH t AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |tot AS (SELECT COUNT(*) AS total FROM t),
      |c AS (SELECT tok, COUNT(*) AS n_true FROM t GROUP BY tok)
      |SELECT tok, n_true, TRUE AS found, TRUE AS bounded
      |FROM c, tot
      |WHERE n_true > total / 31.0""".stripMargin

  /** PER-GROUP heavy hitters — the sketch as a SQL-callable GROUP BY
    * aggregate ([[graft.functions.HeavyHittersSketch]], round-6 missing
    * #1): one `groupBy(source).agg(graft_heavy_hitters(tok, k))` pass
    * shuffles ≤ k counter pairs per group per partial (the 100 TB "top
    * tokens per source/domain" shape — an exact per-group groupBy would
    * shuffle every distinct (source, token)). k = 25 < the 31-token
    * per-source vocabulary, so eviction and lossy partial merges
    * genuinely run in every group. Gate: for every (source, token) with
    * true count > N_g/(k+1) — N_g the group's exact token count, also
    * carried by the sketch — the token is present, never overcounted,
    * and undercounted by ≤ N_g/(k+1). Theorem bounds per group, any
    * merge tree, so the oracle states them as TRUE literals over exact
    * counts it derives independently. */
  def q64HeavyHittersByGroup(spark: SparkSession, dir: String): DataFrame = {
    val k = 25
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val est = toks.groupBy(col("source"))
      .agg(graft.functions.TextFunctions.heavy_hitters(col("tok"), k).as("hh"))
      .select(col("source"), explode(col("hh.items")).as(Seq("tok", "est")))
    val exact = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n_true"))
    val totals = exact.groupBy(col("source")).agg(sum(col("n_true")).as("n_tok"))
    exact.join(totals, "source")
      .filter(col("n_true") > col("n_tok") / lit((k + 1).toDouble))
      .join(est, Seq("source", "tok"), "left")
      .select(col("source"), col("tok"), col("n_true"),
        col("est").isNotNull.as("found"),
        (col("est").isNotNull && col("est") <= col("n_true") &&
          (col("n_true") - col("est")) <= col("n_tok") / lit((k + 1).toDouble))
          .as("bounded"))
  }

  val q64HeavyHittersByGroupSql: String =
    """WITH t AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT source, tok, COUNT(*) AS n_true FROM t GROUP BY 1, 2),
      |g AS (SELECT source, SUM(n_true) AS n_tok FROM c GROUP BY 1)
      |SELECT c.source, c.tok, c.n_true, TRUE AS found, TRUE AS bounded
      |FROM c JOIN g USING (source)
      |WHERE c.n_true > g.n_tok / 26.0""".stripMargin

  /** q165: calendar completeness audit — the warehouse freshness check:
    * every month between the first and last order must be present, and
    * months with anomalously thin volume (4× under the peak) are
    * flagged. The calendar spine is GENERATED (`sequence` over the
    * 2-row min/max aggregate), so absent months surface as zero rows
    * instead of silently not existing — the failure mode count-only
    * monitoring cannot see. Corpus cost: one month-keyed aggregate;
    * everything else is calendar-sized. */
  def q165Completeness(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(trunc(col("o_orderdate"), "month").as("m"))
    val counts = o.groupBy(col("m")).agg(count(lit(1)).as("n_orders"))
    val spine = o.agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 month"))).as("m"))
    val peak = counts.agg(max(col("n_orders")).as("peak"))
    spine.join(counts, Seq("m"), "left")
      .select(date_format(col("m"), "yyyy-MM").as("month"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .crossJoin(broadcast(peak))
      .select(col("month"), col("n_orders"),
        (col("n_orders") === 0).as("is_gap"),
        (col("n_orders") * 4 < col("peak")).as("is_low"))
  }

  val q165CompletenessSql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', o_orderdate) AS m FROM orders),
      |counts AS (SELECT m, COUNT(*) AS n_orders FROM m GROUP BY m),
      |spine AS (
      |  SELECT unnest(generate_series(
      |    (SELECT MIN(m) FROM m), (SELECT MAX(m) FROM m),
      |    INTERVAL 1 MONTH)) AS m),
      |peak AS (SELECT MAX(n_orders) AS peak FROM counts)
      |SELECT strftime(s.m, '%Y-%m') AS month,
      |  COALESCE(c.n_orders, 0) AS n_orders,
      |  COALESCE(c.n_orders, 0) = 0 AS is_gap,
      |  COALESCE(c.n_orders, 0) * 4 < p.peak AS is_low
      |FROM spine s LEFT JOIN counts c ON c.m = s.m CROSS JOIN peak p""".stripMargin

  /** q166: order→ship lead-time percentiles per priority — exact
    * p50/p90/p99 of `datediff(l_shipdate, o_orderdate)` from a
    * per-priority cumulative sum over the bounded DAY histogram (the
    * q153 discipline: the percentile sort runs on distinct day values,
    * never the fact table). One co-keyed join + one (priority, day)
    * aggregate touch the corpus; integer cumulative thresholds — no
    * interpolation convention. The SLA question every warehouse asks. */
  def q166LeadTime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_d"))
    val hist = j.groupBy(col("priority"), col("lag_d"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("priority")).orderBy(col("lag_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("priority"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val h = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    h.groupBy(col("priority"))
      .agg(max(col("n")).as("n_lineitems"),
        min(when(col("cum") * 100 >= col("n") * 50, col("lag_d"))).as("p50_d"),
        min(when(col("cum") * 100 >= col("n") * 90, col("lag_d"))).as("p90_d"),
        min(when(col("cum") * 100 >= col("n") * 99, col("lag_d"))).as("p99_d"),
        max(col("lag_d")).as("max_d"))
  }

  val q166LeadTimeSql: String =
    """WITH j AS (
      |  SELECT o.o_orderpriority AS priority,
      |    CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS lag_d
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |hist AS (
      |  SELECT priority, lag_d, COUNT(*) AS cnt FROM j GROUP BY 1, 2),
      |h AS (
      |  SELECT priority, lag_d, cnt,
      |    SUM(cnt) OVER (PARTITION BY priority ORDER BY lag_d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cnt) OVER (PARTITION BY priority) AS n
      |  FROM hist)
      |SELECT priority, CAST(MAX(n) AS BIGINT) AS n_lineitems,
      |  MIN(CASE WHEN cum * 100 >= n * 50 THEN lag_d END) AS p50_d,
      |  MIN(CASE WHEN cum * 100 >= n * 90 THEN lag_d END) AS p90_d,
      |  MIN(CASE WHEN cum * 100 >= n * 99 THEN lag_d END) AS p99_d,
      |  MAX(lag_d) AS max_d
      |FROM h GROUP BY priority""".stripMargin

  /** q152: financial reconciliation — does `o_totalprice` equal the sum
    * of its line items' `price·(1−disc)·(1+tax)`? The classic warehouse
    * cross-table audit, in EXACT fixed-point: all three measures carry
    * ≤2 decimals, so `cents · (100−d₁₀₀) · (100+t₁₀₀)` is an exact long
    * in 1e-6 currency units — the mismatch test is integer equality, no
    * tolerance knob, no float drift, identical in any engine. One
    * orderkey aggregate over lineitem, one co-keyed LEFT join from
    * orders (orders without lines are their own violation class), one
    * status-sized report. */
  def q152Reconcile(spark: SparkSession, dir: String): DataFrame = {
    val cents = (c: String) => round(col(c) * 100).cast("long")
    val lsum = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents("l_extendedprice") *
        (lit(100L) - cents("l_discount")) *
        (lit(100L) + cents("l_tax"))).as("recomputed_u6"))
    val j = Tables.orders(spark, dir)
      .join(lsum, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderstatus"),
        (cents("o_totalprice") * lit(10000L)).as("stated_u6"),
        coalesce(col("recomputed_u6"), lit(0L)).as("recomputed_u6"),
        col("l_orderkey").isNull.cast("long").as("no_lines"))
    j.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("no_lines")).as("n_no_lineitems"),
        sum(when(col("no_lines") === 0 &&
          col("stated_u6") =!= col("recomputed_u6"), 1L).otherwise(0L))
          .as("n_mismatch"),
        sum(when(col("no_lines") === 0,
          abs(col("stated_u6") - col("recomputed_u6"))).otherwise(0L))
          .as("abs_diff_u6"))
  }

  val q152ReconcileSql: String =
    """WITH lsum AS (
      |  SELECT l_orderkey,
      |    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |      * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS recomputed_u6
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o.o_orderstatus,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000 AS stated_u6,
      |    COALESCE(l.recomputed_u6, 0) AS recomputed_u6,
      |    CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END AS no_lines
      |  FROM orders o LEFT JOIN lsum l ON l.l_orderkey = o.o_orderkey)
      |SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(no_lines) AS BIGINT) AS n_no_lineitems,
      |  CAST(SUM(CASE WHEN no_lines = 0 AND stated_u6 <> recomputed_u6
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
      |  CAST(SUM(CASE WHEN no_lines = 0 THEN abs(stated_u6 - recomputed_u6)
      |    ELSE 0 END) AS BIGINT) AS abs_diff_u6
      |FROM j GROUP BY 1""".stripMargin
}
