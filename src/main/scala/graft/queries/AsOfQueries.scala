package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.AsOf

/** As-of join gate query: attribute each purchase event to the user's most
  * recent prior non-purchase event. The oracle replicates the union/window
  * formulation in a single SQL window pass (deterministic tie-breaks on
  * (ts, side, event_id)).
  */
object AsOfQueries {

  private def asofShape(spark: SparkSession, dir: String, native: Boolean): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val others = e.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts", "event_type")
    val joined =
      if (native)
        AsOf.joinPriorNative(purchases, others, Seq("user_id"), "ts", "ts",
          rightTieBreak = Seq("event_id"))
      else
        AsOf.joinPrior(purchases, others, Seq("user_id"), "ts", "ts",
          rightTieBreak = Seq("event_id"))
    joined.select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("asof.event_id").as("prior_id"),
        col("asof.event_type").as("prior_type"))
  }

  def q31AsofJoin(spark: SparkSession, dir: String): DataFrame =
    asofShape(spark, dir, native = false)

  /** Same query through the whole-operator extension stack
    * ([[graft.plans.AsOfJoinPlan]] → merge-based `AsOfJoinExec`): the
    * oracle is q31's — the custom physical operator must reproduce the
    * union/window formulation's rows exactly. */
  def q56AsofNative(spark: SparkSession, dir: String): DataFrame =
    asofShape(spark, dir, native = true)

  /** Same as-of query again, but phrased entirely in SQL through the
    * `graft_asof` table function ([[graft.ops.AsOf.tableFunctionBuilder]],
    * injected by [[graft.GraftExtensions]]): proves the whole-operator
    * extension is reachable from pure SQL, and the oracle (q31's) proves
    * the SQL path returns the identical rows. */
  def q61AsofTvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // unique view names, dropped after analysis: spark.sql resolves views
    // into the plan eagerly, so the returned DataFrame does not need them
    // — fixed global names would leak into the shared session catalog and
    // cross-talk with any other caller using them
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val pv = s"g_asof_purchases_$tag"; val ov = s"g_asof_others_$tag"
    e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
      .createOrReplaceTempView(pv)
    e.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts", "event_type")
      .createOrReplaceTempView(ov)
    try spark.sql(
      s"""SELECT event_id, user_id,
         |  date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s,
         |  asof.event_id AS prior_id, asof.event_type AS prior_type
         |FROM graft_asof('$pv', '$ov',
         |                'user_id', 'ts', 'ts', 'event_id')""".stripMargin)
    finally {
      spark.catalog.dropTempView(pv)
      spark.catalog.dropTempView(ov): Unit
    }
  }

  /** Range join: views in the hour preceding each purchase, counted per
    * purchase (zero-match purchases included via left join of the counts).
    * Spark side uses the bucketed equi-join ([[graft.ops.RangeJoin]]); the
    * oracle states the naive range predicate — same result set. */
  def q40RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
    val matches = graft.ops.RangeJoin
      .intervalJoin(p, v, "user_id", "p_ts", "v_ts", 3600)
      .groupBy(col("p_id")).agg(count(lit(1)).as("n_views"))
    p.join(matches, Seq("p_id"), "left")
      .select(col("p_id"), col("user_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"))
  }

  val q40RangeJoinSql: String =
    """WITH p AS (
      |  SELECT event_id AS p_id, user_id, date_trunc('microseconds', ts) AS p_ts
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT event_id AS v_id, user_id, date_trunc('microseconds', ts) AS v_ts
      |  FROM events WHERE event_type = 'view'),
      |m AS (
      |  SELECT p_id, COUNT(*) AS n_views
      |  FROM p JOIN v USING (user_id)
      |  WHERE v_ts >= p_ts - INTERVAL 3600 SECONDS AND v_ts <= p_ts
      |  GROUP BY p_id)
      |SELECT p_id, user_id, COALESCE(n_views, 0) AS n_views
      |FROM p LEFT JOIN m USING (p_id)""".stripMargin

  /** q241: matched-control ATT estimate — each TREATED order (urgent/
    * high priority) is matched to the nearest CONTROL order by order
    * date within its customer's market segment (exact match on the
    * discrete confounder, nearest-neighbor on the continuous one — the
    * caliper-free 1-NN matching design), and the effect is the mean
    * treated-minus-matched-control price difference. Nearest-absolute is
    * built from TWO passes of the as-of machinery ([[AsOf.joinPrior]]):
    * backward on day, forward as backward on the negated day, then the
    * closer candidate wins (backward on distance ties). Ties at equal
    * day resolve to the max order key inside joinPrior's ordering —
    * deterministic on both engines.
    *
    * Scale: the as-of union/window shape — one exchange per side on
    * (segment), a single merge-ordered window, no pair explosion; the
    * classic alternative (cross join + argmin) is quadratic per
    * segment. At 100 TB the per-segment ordering shards exactly like
    * the q174 family (ShardedOrder), noted in AsOf's scaladoc.
    */
  def q241MatchedAtt(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val base = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderkey").as("k"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("t"),
        datediff(to_date(col("o_orderdate")),
          lit("1990-01-01").cast("date")).cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("y"))
      .localCheckpoint() // treated/control split feeds two as-of passes
    val treated = base.filter(col("t") === 1)
      .select(col("seg"), col("k"), col("day"), col("y"))
    val controls = base.filter(col("t") === 0)
      .select(col("seg"), col("k").as("ck"), col("day").as("cday"),
        col("y").as("cy"))
    val back = AsOf.joinPrior(treated, controls, Seq("seg"), "day", "cday",
        rightTieBreak = Seq("ck"))
      .select(col("seg"), col("k"), col("day"), col("y"),
        col("asof.cday").as("bday"), col("asof.cy").as("by"))
    val fwdT = treated.withColumn("nday", -col("day"))
    val fwdC = controls.withColumn("ncday", -col("cday"))
    val fwd = AsOf.joinPrior(fwdT, fwdC, Seq("seg"), "nday", "ncday",
        rightTieBreak = Seq("ck"))
      .select(col("seg").as("seg2"), col("k").as("k2"),
        col("asof.cday").as("fday"), col("asof.cy").as("fy"))
    val both = back.join(fwd, col("seg") === col("seg2") &&
        col("k") === col("k2"))
    val db = col("day") - col("bday")
    val df_ = col("fday") - col("day")
    val useB = col("bday").isNotNull &&
      (col("fday").isNull || db <= df_)
    val matched = both
      .filter(col("bday").isNotNull || col("fday").isNotNull)
      .select(col("seg"), col("y"),
        when(useB, col("by")).otherwise(col("fy")).as("ym"))
    matched.agg(count(lit(1)).as("n_matched"),
        sum(col("y") - col("ym")).as("sd"))
      .select(col("n_matched"),
        round(lit(1e6) * col("sd").cast("double") /
          col("n_matched").cast("double")).cast("long").as("att_fp6"))
  }

  val q241MatchedAttSql: String =
    """WITH base AS (
      |  SELECT c.c_mktsegment AS seg, o.o_orderkey AS k,
      |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END AS t,
      |    CAST(date_diff('day', DATE '1990-01-01', o.o_orderdate::DATE)
      |      AS BIGINT) AS day,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |u AS (
      |  SELECT seg, k, t, day, y,
      |    last_value(CASE WHEN t = 0 THEN day END IGNORE NULLS)
      |      OVER wb AS bday,
      |    last_value(CASE WHEN t = 0 THEN y END IGNORE NULLS)
      |      OVER wb AS by
      |  FROM base
      |  WINDOW wb AS (PARTITION BY seg
      |    ORDER BY day, t, CASE WHEN t = 0 THEN k END
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |v AS (
      |  SELECT seg, k, t, day, y, bday, by,
      |    last_value(CASE WHEN t = 0 THEN day END IGNORE NULLS)
      |      OVER wf AS fday,
      |    last_value(CASE WHEN t = 0 THEN y END IGNORE NULLS)
      |      OVER wf AS fy
      |  FROM u
      |  WINDOW wf AS (PARTITION BY seg
      |    ORDER BY -day, t, CASE WHEN t = 0 THEN k END
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |m AS (
      |  SELECT seg, y,
      |    CASE WHEN bday IS NOT NULL
      |      AND (fday IS NULL OR day - bday <= fday - day)
      |      THEN by ELSE fy END AS ym
      |  FROM v
      |  WHERE t = 1 AND (bday IS NOT NULL OR fday IS NOT NULL))
      |SELECT COUNT(*) AS n_matched,
      |  CAST(round(1e6 * CAST(SUM(y - ym) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS att_fp6
      |FROM m""".stripMargin

  val q31AsofJoinSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, event_type
      |  FROM events),
      |m AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
      |      OVER w AS prior_id,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER w AS prior_type
      |  FROM e
      |  WINDOW w AS (
      |    PARTITION BY user_id
      |    ORDER BY ts,
      |      CASE WHEN event_type <> 'purchase' THEN 0 ELSE 1 END,
      |      event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  prior_id, prior_type
      |FROM m WHERE event_type = 'purchase'""".stripMargin
}
