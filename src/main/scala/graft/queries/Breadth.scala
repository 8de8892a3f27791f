package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}

/** Breadth queries: string-function surface, outer-join histogram (TPC-H
  * Q13 shape), disjunctive predicate pushdown (Q19 shape), null semantics.
  */
object Breadth {

  /** String scalar functions over part names. */
  def q36StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.select(
        col("p_partkey"),
        upper(col("p_name")).as("u"),
        substring(col("p_name"), 1, 5).as("s5"),
        length(col("p_name")).cast("long").as("len"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("devowel"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        col("p_name").like("%a%").as("has_a"),
        reverse(col("p_name")).as("rev"),
        split_part(col("p_name"), lit("a"), lit(1)).as("before_a"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
  }

  val q36StringFuncsSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS u,
      |  substr(p_name, 1, 5) AS s5,
      |  CAST(length(p_name) AS BIGINT) AS len,
      |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
      |  p_name LIKE '%a%' AS has_a,
      |  reverse(p_name) AS rev,
      |  split_part(p_name, 'a', 1) AS before_a,
      |  concat_ws('|', p_brand, p_type) AS brand_type
      |FROM part""".stripMargin

  /** Customer-order-count distribution (TPC-H Q13 shape): LEFT OUTER join
    * so zero-order customers appear; COUNT(col) skips their null keys. */
  def q37Custdist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q37CustdistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  /** Disjunctive join predicate (TPC-H Q19 shape): OR-of-conjunctions over
    * both sides; Catalyst extracts the common-side filters for pushdown. */
  def q38Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20)) ||
        (col("p_size") >= 40 && col("l_quantity") > 30))
      .agg(
        Det.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q38DisjunctiveSql: String =
    """SELECT
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_size >= 40 AND l_quantity > 30)""".stripMargin

  /** Array aggregation: collect + distinct + sort, emitted as a joined
    * string (array columns don't hash-compare portably across engines). */
  def q41ArrayAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.groupBy(col("l_suppkey"))
      .agg(
        array_join(array_sort(array_distinct(collect_list(col("l_returnflag")))), ",")
          .as("flags"),
        size(array_distinct(collect_list(col("l_returnflag")))).cast("long")
          .as("n_flags"))
  }

  val q41ArrayAggSql: String =
    """SELECT l_suppkey,
      |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags,
      |  CAST(len(list(DISTINCT l_returnflag)) AS BIGINT) AS n_flags
      |FROM lineitem
      |GROUP BY l_suppkey""".stripMargin

  /** Date arithmetic breadth: day diffs, interval add, month boundaries,
    * ISO day-of-week (the engines' plain dayofweek numberings differ). */
  def q42DateArith(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
        col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
        date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("som"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("dow_iso"))
  }

  val q42DateArithSql: String =
    """SELECT o_orderkey,
      |  date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since,
      |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS som,
      |  CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso
      |FROM orders""".stripMargin

  /** Pivot: event counts per user by type, types as columns. The Spark
    * side uses the real `pivot` operator (with explicit values so the plan
    * needs no extra distinct pass); the oracle states the equivalent
    * conditional aggregation. */
  def q43Pivot(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  val q43PivotSql: String =
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events
      |GROUP BY user_id""".stripMargin

  /** Ranking/navigation window-function breadth in one pass: rank,
    * dense_rank, ntile, lag delta, cume_dist — all under one fully
    * deterministic ordering. This gate deliberately exercises the
    * BUILT-IN window surface as-is (3 order statuses ⇒ 3 sort tasks);
    * the production path for a low-cardinality partition key at scale
    * is [[graft.ops.ShardedOrder]] (rank/row_number/prefix-max all
    * decompose — see the rewired q174/q175/q184/q194/q164). */
  def q44WindowBreadth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("gap_to_prev"),
        cume_dist().over(w).as("cd"))
  }

  val q44WindowBreadthSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  o_totalprice - lag(o_totalprice, 1) OVER w AS gap_to_prev,
      |  cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus
      |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin

  /** Bag-semantics set ops: EXCEPT ALL keeps multiplicity (a key appearing
    * 3× in customers and 1× in suppliers survives 2×), unlike q11's set
    * forms. */
  def q45BagSetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("long").as("nationkey"))
    c.exceptAll(s)
      .groupBy(col("nationkey")).agg(count(lit(1)).as("multiplicity"))
  }

  val q45BagSetOpsSql: String =
    """SELECT nationkey, COUNT(*) AS multiplicity
      |FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |  EXCEPT ALL
      |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
      |GROUP BY nationkey""".stripMargin

  /** Pagination: deterministic ORDER BY + OFFSET/LIMIT page. */
  def q46Pagination(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(100).limit(50)
  }

  val q46PaginationSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderstatus
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 50 OFFSET 100""".stripMargin

  /** Null semantics: nullif-generated nulls, COUNT(col) vs COUNT(*),
    * null-safe grouping, coalesce. */
  def q39NullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(nullif(col("o_orderstatus"), lit("P")).as("ns"),
        col("o_totalprice"))
      .groupBy(col("ns"))
      .agg(
        count(lit(1)).as("n_total"),
        count(col("ns")).as("n_nonnull"),
        coalesce(col("ns"), lit("PENDING")).as("label"),
        Det.centsSum(col("o_totalprice")).as("total"))
      .select(col("ns"), col("n_total"), col("n_nonnull"), col("label"), col("total"))
  }

  val q39NullSemanticsSql: String =
    """SELECT nullif(o_orderstatus, 'P') AS ns,
      |  COUNT(*) AS n_total,
      |  COUNT(nullif(o_orderstatus, 'P')) AS n_nonnull,
      |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS label,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      |FROM orders
      |GROUP BY nullif(o_orderstatus, 'P')""".stripMargin

  /** q133: skyline (Pareto frontier) over the part catalog — parts where
    * no other part is both cheaper and larger (min price, max size with
    * one strict). The classic multi-criteria shortlist operator
    * (Börzsönyi et al. 2001). The engine runs the distributed two-level
    * prefix-max ([[graft.ops.Skyline]] — no global sort); the oracle runs
    * the semantically-identical single-window form, so the gate also
    * certifies the scan decomposition. Comparisons only — no float
    * arithmetic to mirror. */
  def q133Skyline(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Skyline.skyline2D(
      Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size")),
      costCol = "p_retailprice", gainCol = "p_size",
      bucketOf = c => floor(c / 100))

  val q133SkylineSql: String =
    """WITH percost AS (
      |  SELECT p_retailprice AS c, MAX(p_size) AS mg
      |  FROM part GROUP BY 1),
      |pref AS (
      |  SELECT c, mg, MAX(mg) OVER (ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM percost)
      |SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
      |FROM part p JOIN pref f ON p.p_retailprice = f.c
      |WHERE p.p_size = f.mg AND (f.pm IS NULL OR f.pm < p.p_size)""".stripMargin
}
