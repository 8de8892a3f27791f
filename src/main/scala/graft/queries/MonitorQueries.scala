package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Monitor

/** Corpus-monitoring gates: the drift / diversity metrics a pipeline runs
  * on every ingest to catch a source gone wrong BEFORE it trains a model.
  */
object MonitorQueries {

  /** q97: per-source Population Stability Index of the document-length
    * distribution vs the corpus — "did any source's length profile drift
    * from the corpus shape?". Fixed 100-char buckets, Laplace smoothing,
    * per-bucket terms fp9-rounded before the (integer) sum so the result
    * is reduction-order-free. One corpus shuffle; the rest is grid-sized.
    */
  def q97PsiDrift(spark: SparkSession, dir: String): DataFrame =
    Monitor.psiByGroup(
        Tables.documents(spark, dir), "source", expr("n_chars div 100"))
      .select(col("source"), col("n_docs"), col("psi_fp9"))

  val q97PsiDriftSql: String =
    """WITH grp AS (
      |  SELECT source, n_chars // 100 AS bucket, COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_g FROM grp GROUP BY 1),
      |bkt AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_b FROM grp GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n, COUNT(*) AS nb FROM bkt),
      |terms AS (
      |  SELECT s.source, s.n_g,
      |    CAST(round(
      |      ((COALESCE(g.c, 0) + 0.5) / (s.n_g + 0.5 * t.nb)
      |        - (b.n_b + 0.5) / (t.n + 0.5 * t.nb))
      |      * ln(((COALESCE(g.c, 0) + 0.5) / (s.n_g + 0.5 * t.nb))
      |           / ((b.n_b + 0.5) / (t.n + 0.5 * t.nb)))
      |      * 1e9) AS BIGINT) AS term_fp9
      |  FROM src s
      |  CROSS JOIN bkt b
      |  CROSS JOIN tot t
      |  LEFT JOIN grp g ON g.source = s.source AND g.bucket = b.bucket)
      |SELECT source, n_g AS n_docs, CAST(SUM(term_fp9) AS BIGINT) AS psi_fp9
      |FROM terms GROUP BY source, n_g""".stripMargin

  /** q174: robust (median/MAD) outlier report per event type — the
    * monitoring alternative to mean/stddev z-scores, which a single bad
    * batch can drag far enough to mask itself. Values go to exact
    * micro-units; both medians use the q112 cumulative-crossing rule
    * (lower median — integer comparisons, no interpolation); the outlier
    * cut |v − med| > 3.5 · 1.4826 · MAD is the integer cross-
    * multiplication `dev · 100000 > 518910 · mad`, so no float enters the
    * gate at all.
    *
    * Scale shape: both median passes run the SHARDED value-at-rank
    * ([[graft.ops.ShardedOrder.shardedValueAtRank]]) — bucket counts
    * locate the bucket holding rank ⌈n/2⌉ (grid-sized), the corpus is
    * pruned to that one bucket per type BEFORE the only window, and no
    * row outside it is ever ranked — so the sort parallelism is types ×
    * cores AND the windowed volume is ~n/32, versus the ~10-task
    * per-type total sort of SCALING_r12 note B. The cut points only
    * steer load balance; the crossing value is identical, so the
    * plain-window DuckDB oracle is unchanged and the hash match
    * certifies the rewrite as a semantic identity. */
  def q174MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"),
      col("event_id"), round(col("value") * 1e6).cast("long").as("v_us"))
    // min v where rn·2 ≥ n  ≡  the value at rank ⌈n/2⌉ of (v, event_id)
    def crossingMedian(df: DataFrame, v: String, out: String): DataFrame =
      graft.ops.ShardedOrder.shardedValueAtRank(df, Seq("event_type"), v,
        Seq("event_id"), n => shiftright(n + 1L, 1), out)
    // type-sized barriers: the MAD pass references `dev` three times
    // (cuts, counts, pruned window) — un-barriered, each reference
    // re-runs the ENTIRE first-median pipeline under the broadcast join
    val med = crossingMedian(e, "v_us", "med_us").localCheckpoint()
    val dev = e.join(broadcast(med), "event_type")
      .select(col("event_type"), col("event_id"),
        abs(col("v_us") - col("med_us")).as("dev"))
    val mad = crossingMedian(dev, "dev", "mad_us").localCheckpoint()
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("dev") * 100000L > col("mad_us") * 518910L).cast("long"))
          .as("n_outliers"))
      .join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .select(col("event_type"), col("n"), col("med_us"), col("mad_us"),
        col("n_outliers"))
  }

  val q174MadOutliersSql: String =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 1e6) AS BIGINT) AS v_us
      |  FROM events),
      |r1 AS (
      |  SELECT event_type, v_us,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v_us, event_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |med AS (
      |  SELECT event_type, MIN(v_us) AS med_us FROM r1
      |  WHERE rn * 2 >= n GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, e.event_id, abs(e.v_us - m.med_us) AS dev
      |  FROM e JOIN med m USING (event_type)),
      |r2 AS (
      |  SELECT event_type, dev,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT event_type, MIN(dev) AS mad_us FROM r2
      |  WHERE rn * 2 >= n GROUP BY 1)
      |SELECT d.event_type, COUNT(*) AS n, MIN(m.med_us) AS med_us,
      |  MIN(a.mad_us) AS mad_us,
      |  CAST(SUM(CASE WHEN d.dev * 100000 > a.mad_us * 518910
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN med m USING (event_type) JOIN mad a USING (event_type)
      |GROUP BY d.event_type""".stripMargin

  /** q183: CUSUM drift monitor over daily event volumes (Page 1954) —
    * the change-point statistic that catches a slow upward drift a
    * fixed-threshold alert sleeps through. The textbook recursion
    * `S_d = max(0, S_{d−1} + (x_d − μ))` looks inherently sequential;
    * the distributed form is the PREFIX identity
    * `S_d = cum_d − min(0, min_{j≤d} cum_j)` (running sum minus the
    * running min of the running sum, CLAMPED at the implicit cum₀ = 0
    * prefix — without the clamp the first monitored day always scores
    * 0 and an immediate upward drift is under-counted by its first
    * prefix sum), which two window passes over the SAME day ordering
    * compute with no recursion. μ is the per-type mean of the
    * first-14-day baseline kept as an exact RATIONAL: everything is
    * multiplied through by the baseline day count, so the gate is
    * integer end-to-end. Alarm when the scaled statistic exceeds three
    * baseline-days' worth of volume. One day-keyed aggregate, two
    * same-partitioning windows; day grid per type, so output is
    * calendar-sized. */
  def q183Cusum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .crossJoin(broadcast(minDay))
      .select(col("event_type"), datediff(col("day"), col("d0")).cast("long").as("d"),
        col("x"))
      // calendar-sized barrier: baseline AND monitor branches both read
      // this table — without it each re-runs the corpus day aggregate
      .localCheckpoint()
    val base = daily.filter(col("d") < 14)
      .groupBy(col("event_type"))
      .agg(sum(col("x")).as("base_sum"), count(lit(1)).as("base_days"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily.join(broadcast(base), "event_type")
      .filter(col("d") >= 14)
      .withColumn("y", col("base_days") * col("x") - col("base_sum"))
      .withColumn("cum", sum(col("y")).over(wOrd))
      .withColumn("cusum", col("cum") - least(lit(0L), min(col("cum")).over(wOrd)))
    scored.select(col("event_type"), col("d").as("day_idx"), col("x").as("n_events"),
      col("cusum").as("cusum_scaled"),
      (col("cusum") > col("base_sum") * 3).as("alarm"))
  }

  val q183CusumSql: String =
    """WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |daily AS (
      |  SELECT event_type, date_diff('day', d0.d0, ts::DATE) AS d,
      |    COUNT(*) AS x
      |  FROM events, d0 GROUP BY 1, 2),
      |base AS (
      |  SELECT event_type, SUM(x) AS base_sum, COUNT(*) AS base_days
      |  FROM daily WHERE d < 14 GROUP BY 1),
      |scored AS (
      |  SELECT dd.event_type, dd.d, dd.x, b.base_sum,
      |    b.base_days * dd.x - b.base_sum AS y
      |  FROM daily dd JOIN base b USING (event_type)
      |  WHERE dd.d >= 14),
      |cums AS (
      |  SELECT event_type, d, x, base_sum,
      |    SUM(y) OVER (PARTITION BY event_type ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM scored)
      |SELECT event_type, CAST(d AS BIGINT) AS day_idx, x AS n_events,
      |  CAST(cum - LEAST(0, MIN(cum) OVER (PARTITION BY event_type ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT)
      |    AS cusum_scaled,
      |  (cum - LEAST(0, MIN(cum) OVER (PARTITION BY event_type ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
      |    > base_sum * 3 AS alarm
      |FROM cums""".stripMargin

  /** q184: trimmed mean per event type — the other robust-center
    * estimator (q174's median sibling): drop the exact ⌊n/20⌋ lowest and
    * highest values BY RANK (row_number over (value, event_id) — a
    * deterministic total order, no interpolation, no percentile call)
    * and average the exact-micro-unit remainder. The plain mean rides
    * along so the gap — the tail mass the trim removed — is the
    * reported signal. Sums are exact integers.
    *
    * Scale shape: the HISTOGRAM decomposition
    * ([[graft.ops.ShardedOrder.shardedRangeSum]]) — per-(type, bucket)
    * count/sum aggregates decide wholly-kept buckets arithmetically at
    * the grid level; only the ≤2 boundary buckets per type are ever
    * ranked, over ~n/32 rows pruned before the exchange. No per-type
    * total sort, no corpus-wide rank materialization; the unchanged
    * plain-window oracle certifies the identity. */
  def q184TrimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"),
      col("event_id"), round(col("value") * 1e6).cast("long").as("v_us"))
    // integer division (n DIV 20), NOT double /: exact floor — the cuts
    // are (lo, hi] = (n div 20, n − n div 20], matching the oracle's
    // rn > n // 20 AND rn <= n - n // 20
    def nDiv20(n: org.apache.spark.sql.Column) =
      ((n - pmod(n, lit(20L))) / 20L).cast("long")
    graft.ops.ShardedOrder.shardedRangeSum(e, Seq("event_type"), "v_us",
        Seq("event_id"), loOf = nDiv20, hiOf = n => n - nDiv20(n))
      .select(col("event_type"), col("n"), col("n_kept"),
        round(col("s_all").cast("double") / col("n")).cast("long")
          .as("mean_us"),
        round(col("s_kept").cast("double") / col("n_kept")).cast("long")
          .as("trimmed_mean_us"))
  }

  val q184TrimmedMeanSql: String =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 1e6) AS BIGINT) AS v_us
      |  FROM events),
      |ranked AS (
      |  SELECT event_type, v_us,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v_us, event_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |kept AS (
      |  SELECT event_type, COUNT(*) AS n_kept,
      |    CAST(SUM(v_us) AS BIGINT) AS s_kept
      |  FROM ranked WHERE rn > n // 20 AND rn <= n - n // 20 GROUP BY 1),
      |allv AS (
      |  SELECT event_type, COUNT(*) AS n, CAST(SUM(v_us) AS BIGINT) AS s_all
      |  FROM e GROUP BY 1)
      |SELECT a.event_type, a.n, k.n_kept,
      |  CAST(round(CAST(s_all AS DOUBLE) / a.n) AS BIGINT) AS mean_us,
      |  CAST(round(CAST(s_kept AS DOUBLE) / k.n_kept) AS BIGINT)
      |    AS trimmed_mean_us
      |FROM allv a JOIN kept k USING (event_type)""".stripMargin

  /** q187: seasonal-naïve forecast backtest — per event type, forecast
    * each day's volume as the same weekday's volume one week earlier
    * (the baseline every real forecaster must beat before shipping
    * anything smarter), scored as MAPE plus signed bias over the
    * monitoring window (day ≥ 14, so every scored day has a lag-7
    * actual in the dense grid). Per-day errors are exact integer-ratio
    * fp6 values; the aggregate averages those integers — no float
    * accumulation order anywhere. One day-keyed aggregate + one lag
    * window over the type partitioning. */
  def q187SeasonalNaive(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .crossJoin(broadcast(minDay))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("d"), col("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val scored = daily.withColumn("f", lag(col("x"), 7).over(w))
      .filter(col("d") >= 14 && col("f").isNotNull)
      .select(col("event_type"),
        round(lit(1e6) * abs(col("x") - col("f")) / col("x")).cast("long")
          .as("ape_fp6"),
        round(lit(1e6) * (col("f") - col("x")) / col("x")).cast("long")
          .as("spe_fp6"))
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("ape_fp6")).cast("double") / count(lit(1))).cast("long")
          .as("mape_fp6"),
        round(sum(col("spe_fp6")).cast("double") / count(lit(1))).cast("long")
          .as("bias_fp6"))
  }

  val q187SeasonalNaiveSql: String =
    """WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |daily AS (
      |  SELECT event_type, date_diff('day', d0.d0, ts::DATE) AS d,
      |    COUNT(*) AS x
      |  FROM events, d0 GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, x,
      |    lag(x, 7) OVER (PARTITION BY event_type ORDER BY d) AS f, d
      |  FROM daily),
      |err AS (
      |  SELECT event_type,
      |    CAST(round(1e6 * abs(x - f) / x) AS BIGINT) AS ape_fp6,
      |    CAST(round(1e6 * (f - x) / x) AS BIGINT) AS spe_fp6
      |  FROM scored WHERE d >= 14 AND f IS NOT NULL)
      |SELECT event_type, COUNT(*) AS n_days,
      |  CAST(round(CAST(SUM(ape_fp6) AS DOUBLE) / COUNT(*)) AS BIGINT)
      |    AS mape_fp6,
      |  CAST(round(CAST(SUM(spe_fp6) AS DOUBLE) / COUNT(*)) AS BIGINT)
      |    AS bias_fp6
      |FROM err GROUP BY event_type""".stripMargin

  /** q190: autocorrelation function (ACF) of daily volumes at lags 1–7
    * per event type — the box a forecaster checks before believing the
    * q187 seasonal-naïve baseline (a lag-7 spike says weekly
    * seasonality is real; a flat ACF says the naïve forecast is as good
    * as it gets). Pearson r between the series and its lag-k shift.
    *
    * Determinism: daily counts are integers, so Σx, Σy, Σxy, Σx², Σy²
    * are EXACT (128-bit accumulators: Decimal(38,0) / HUGEINT — the
    * q175 discipline); the correlation assembles those exact sums in
    * one shared IEEE expression and rounds once to fp6. Sums stay below
    * 2⁵³ for any per-day count the calendar-sized grid can hold, so the
    * double cast is itself exact. Scale shape: one day-keyed aggregate,
    * one window pass producing all seven lags, and a 7-way in-row
    * unpivot — the pair stream is calendar-sized (days × 7), not
    * event-sized. */
  def q190Acf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .crossJoin(broadcast(minDay))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("d"), col("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val lags = daily.select(col("event_type") +: col("x") +:
      (1 to 7).map(k => lag(col("x"), k).over(w).as(s"l$k")): _*)
    val pairs = lags
      .select(col("event_type"), col("x"),
        posexplode(array((1 to 7).map(k => col(s"l$k")): _*)).as(Seq("k0", "y")))
      .filter(col("y").isNotNull)
      .select(col("event_type"), (col("k0") + 1).cast("long").as("lag"),
        col("x"), col("y"))
    val agg = pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(DecimalType(19, 0)) * col("y")).as("sxy"),
        sum(col("x").cast(DecimalType(19, 0)) * col("x")).as("sxx"),
        sum(col("y").cast(DecimalType(19, 0)) * col("y")).as("syy"))
    val nD = col("n_pairs").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val dx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val dy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    agg.filter(dx > 0 && dy > 0)
      .select(col("event_type"), col("lag"), col("n_pairs"),
        round(lit(1e6) * num / (sqrt(dx) * sqrt(dy))).cast("long").as("acf_fp6"))
  }

  val q190AcfSql: String = {
    val lagList = (1 to 7).map(k => s"lag(x, $k) OVER w").mkString("[", ", ", "]")
    s"""WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |daily AS (
      |  SELECT event_type, date_diff('day', d0.d0, ts::DATE) AS d,
      |    COUNT(*) AS x
      |  FROM events, d0 GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, x, $lagList AS ls
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      |pairs AS (
      |  SELECT event_type, CAST(r.k AS BIGINT) AS lag, x, ls[r.k] AS y
      |  FROM l CROSS JOIN range(1, 8) r(k)
      |  WHERE ls[r.k] IS NOT NULL),
      |a AS (
      |  SELECT event_type, lag, COUNT(*) AS n_pairs,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy
      |  FROM pairs GROUP BY 1, 2)
      |SELECT event_type, lag, n_pairs,
      |  CAST(round(1e6 * (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |     * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT)
      |    AS acf_fp6
      |FROM a
      |WHERE CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |  AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
      |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0""".stripMargin
  }

  /** q194: Mann–Whitney rank-sum A/B test (Mann & Whitney 1947) per
    * event type, arms split by `user_id % 2` — the nonparametric
    * experiment readout that needs no normality assumption and, being
    * rank-based, is EXACT in integers: with tie groups handled by
    * average ranks, `2·avg_rank = 2·rank + tie_size − 1` is an
    * integer, so the rank sum, the U statistic (doubled), and the
    * rank-biserial AUC numerator never touch floats until the single
    * final division. AUC here = P(random A value > random B value) +
    * ½P(tie) — the common-language effect size.
    *
    * Scale shape: the SHARDED rank-sum aggregate
    * ([[graft.ops.ShardedOrder.shardedRank2Sum]]) — value-range buckets
    * per type, local rank + tie count per (type, bucket) on ONE
    * exchange, then per-(bucket, arm) partial sums with the global
    * offset entering ARITHMETICALLY (`+ 2·off·count`) at grid size —
    * so a hot type engages every core and no rank is ever joined back
    * to a corpus row (ties share a bucket by construction, which is
    * what keeps `offset + local rank` exact). The unchanged
    * plain-window oracle certifies the identity. */
  def q194RankSumAb(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 2).cast("long").as("arm"),
        col("value"))
    val agg = graft.ops.ShardedOrder
      .shardedRank2Sum(e, Seq("event_type"), "value", Seq("arm"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, col("r2_sum")).otherwise(lit(0L))).as("r2_a"),
        sum(when(col("arm") === 0, col("n")).otherwise(lit(0L))).as("n_a"),
        sum(when(col("arm") === 1, col("n")).otherwise(lit(0L))).as("n_b"))
    val u2 = col("r2_a") - col("n_a") * (col("n_a") + 1)
    agg.filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("event_type"), col("n_a"), col("n_b"), u2.as("u2_a"),
        round(lit(1e6) * u2.cast("double") /
          (lit(2.0) * col("n_a") * col("n_b"))).cast("long").as("auc_fp6"))
  }

  val q194RankSumAbSql: String =
    """WITH e AS (
      |  SELECT event_type, user_id % 2 AS arm, value FROM events),
      |r AS (
      |  SELECT event_type, arm,
      |    2 * rank() OVER (PARTITION BY event_type ORDER BY value)
      |      + COUNT(*) OVER (PARTITION BY event_type, value) - 1 AS r2
      |  FROM e),
      |a AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN arm = 0 THEN r2 ELSE 0 END) AS BIGINT) AS r2_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM r GROUP BY 1)
      |SELECT event_type, n_a, n_b,
      |  r2_a - n_a * (n_a + 1) AS u2_a,
      |  CAST(round(1e6 * CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
      |    / (2.0 * n_a * n_b)) AS BIGINT) AS auc_fp6
      |FROM a WHERE n_a > 0 AND n_b > 0""".stripMargin

  /** q204: single changepoint by binary segmentation — per event type,
    * the split day maximizing the absolute mean-level difference
    * between the left and right segments of the daily-volume series
    * (both segments ≥ 7 days), the first round of the classic binary
    * segmentation recursion and the "WHEN did the level shift"
    * complement to q183's CUSUM "has it shifted" alarm.
    *
    * Determinism: every candidate split's score is assembled from
    * exact integers (prefix sum, prefix count, per-type totals — all
    * from ONE window pass over one ordering) and fp6-quantized BEFORE
    * the argmax, so the winning split is an integer comparison with a
    * day-index tie-break — no float ordering anywhere. Scale shape:
    * the corpus collapses to the calendar-sized day grid first; the
    * scan of candidate splits is a window over that grid, not the
    * events. */
  def q204Changepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .crossJoin(broadcast(minDay))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("d"), col("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val wT = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("cum", sum(col("x")).over(w))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wT))
      .withColumn("tot", sum(col("x")).over(wT))
      .filter(col("i") >= 7 && col("i") <= col("n") - 7)
      .select(col("event_type"), col("d"),
        round(lit(1e6) * col("cum").cast("double") / col("i")).cast("long")
          .as("ml_fp6"),
        round(lit(1e6) * (col("tot") - col("cum")).cast("double") /
          (col("n") - col("i"))).cast("long").as("mr_fp6"))
      .withColumn("score_fp6", abs(col("ml_fp6") - col("mr_fp6")))
    scored.withColumn("rn", row_number().over(Window
        .partitionBy(col("event_type"))
        .orderBy(col("score_fp6").desc, col("d"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("d").as("split_day"),
        col("ml_fp6"), col("mr_fp6"), col("score_fp6"))
  }

  val q204ChangepointSql: String =
    """WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |daily AS (
      |  SELECT event_type, date_diff('day', d0.d0, ts::DATE) AS d,
      |    COUNT(*) AS x
      |  FROM events, d0 GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, d,
      |    SUM(x) OVER (PARTITION BY event_type ORDER BY d) AS cum,
      |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n,
      |    SUM(x) OVER (PARTITION BY event_type) AS tot
      |  FROM daily),
      |sc AS (
      |  SELECT event_type, d,
      |    CAST(round(1e6 * CAST(cum AS DOUBLE) / i) AS BIGINT) AS ml_fp6,
      |    CAST(round(1e6 * CAST(tot - cum AS DOUBLE) / (n - i)) AS BIGINT)
      |      AS mr_fp6
      |  FROM c WHERE i >= 7 AND i <= n - 7)
      |SELECT event_type, d AS split_day, ml_fp6, mr_fp6,
      |  abs(ml_fp6 - mr_fp6) AS score_fp6
      |FROM sc
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |  ORDER BY abs(ml_fp6 - mr_fp6) DESC, d) = 1""".stripMargin

  /** q208: difference-in-differences estimate per event type — arms by
    * `user_id % 2`, periods split at day 14: `DiD = (treated_post −
    * treated_pre) − (control_post − control_pre)` over mean event
    * value. The experiment readout that nets out both the level
    * difference between arms and the common time trend — what an
    * A/B-with-history analysis actually reports, complementing q194's
    * distribution test with a causal-style point estimate.
    *
    * Determinism: values fp6-quantize first, so all eight cell
    * aggregates (4 sums, 4 counts) are exact integers; the four means
    * and the double difference are ONE shared IEEE expression rounded
    * once. Scale shape: single conditional aggregate — the corpus
    * folds to 8 counters per type, map-side combined, constant shuffle
    * bytes. */
  def q208DiffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val base = e.crossJoin(broadcast(minDay))
      .select(col("event_type"),
        (col("user_id") % 2 === 1).as("treated"),
        (datediff(to_date(col("ts")), col("d0")) >= 14).as("post"),
        round(col("value") * lit(1e6)).cast("long").as("v6"))
    def cell(t: Boolean, p: Boolean, x: org.apache.spark.sql.Column) =
      sum(when(col("treated") === t && col("post") === p, x).otherwise(lit(0L)))
    val a = base.groupBy(col("event_type")).agg(
      cell(t = true, p = true, col("v6")).as("s_tp"),
      cell(t = true, p = true, lit(1L)).as("n_tp"),
      cell(t = true, p = false, col("v6")).as("s_tr"),
      cell(t = true, p = false, lit(1L)).as("n_tr"),
      cell(t = false, p = true, col("v6")).as("s_cp"),
      cell(t = false, p = true, lit(1L)).as("n_cp"),
      cell(t = false, p = false, col("v6")).as("s_cr"),
      cell(t = false, p = false, lit(1L)).as("n_cr"))
    def m(s: String, n: String) = col(s).cast("double") / col(n)
    a.filter(col("n_tp") > 0 && col("n_tr") > 0 &&
        col("n_cp") > 0 && col("n_cr") > 0)
      .select(col("event_type"),
        col("n_tp"), col("n_tr"), col("n_cp"), col("n_cr"),
        round((m("s_tp", "n_tp") - m("s_tr", "n_tr")) -
          (m("s_cp", "n_cp") - m("s_cr", "n_cr"))).cast("long").as("did_fp6"))
  }

  val q208DiffInDiffSql: String =
    """WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |base AS (
      |  SELECT event_type,
      |    user_id % 2 = 1 AS treated,
      |    date_diff('day', d0.d0, ts::DATE) >= 14 AS post,
      |    CAST(round(value * 1e6) AS BIGINT) AS v6
      |  FROM events, d0),
      |a AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN treated AND post THEN v6 ELSE 0 END) AS BIGINT) AS s_tp,
      |    CAST(SUM(CASE WHEN treated AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
      |    CAST(SUM(CASE WHEN treated AND NOT post THEN v6 ELSE 0 END) AS BIGINT) AS s_tr,
      |    CAST(SUM(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
      |    CAST(SUM(CASE WHEN NOT treated AND post THEN v6 ELSE 0 END) AS BIGINT) AS s_cp,
      |    CAST(SUM(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
      |    CAST(SUM(CASE WHEN NOT treated AND NOT post THEN v6 ELSE 0 END) AS BIGINT) AS s_cr,
      |    CAST(SUM(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_cr
      |  FROM base GROUP BY 1)
      |SELECT event_type, n_tp, n_tr, n_cp, n_cr,
      |  CAST(round((CAST(s_tp AS DOUBLE) / n_tp - CAST(s_tr AS DOUBLE) / n_tr)
      |    - (CAST(s_cp AS DOUBLE) / n_cp - CAST(s_cr AS DOUBLE) / n_cr))
      |    AS BIGINT) AS did_fp6
      |FROM a
      |WHERE n_tp > 0 AND n_tr > 0 AND n_cp > 0 AND n_cr > 0""".stripMargin

  /** q212: χ² two-proportion conversion test — per-user "ever
    * purchased" flags by `user_id % 2` arm, the 2×2 χ² statistic
    * `N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` plus the raw conversion
    * lift: the binary-outcome member of the experimentation family
    * (q194 ranks continuous values, q208 nets out trends, this tests
    * the conversion RATE). χ² ≳ 3.84 is the 95% line for 1 dof.
    *
    * Determinism: the four cells are exact integer counts; the
    * statistic is ONE shared IEEE expression (explicit multiply, no
    * libm pow). Scale shape: a user-keyed aggregate folding to four
    * counters — constant shuffle bytes after the per-user flag. */
  def q212ChiSquare(spark: SparkSession, dir: String): DataFrame = {
    // "converted" = above-average purchaser (pc·U > P, an exact integer
    // cross-multiply): the dense synthetic corpus gives EVERY user every
    // event type, so the ever-purchased flag would be degenerate; the
    // above-mean cut is scale-free and discriminates at any SF
    val pc = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)))
        .as("pc"))
    val tot = pc.agg(sum(col("pc")).as("p"), count(lit(1)).as("u"))
    val conv = pc.crossJoin(broadcast(tot))
      .select((col("user_id") % 2).as("arm"),
        when(col("pc") * col("u") > col("p"), lit(1L)).otherwise(lit(0L)).as("cv"))
    val cells = conv.agg(
      sum(when(col("arm") === 0 && col("cv") === 1, lit(1L)).otherwise(lit(0L))).as("a"),
      sum(when(col("arm") === 0 && col("cv") === 0, lit(1L)).otherwise(lit(0L))).as("b"),
      sum(when(col("arm") === 1 && col("cv") === 1, lit(1L)).otherwise(lit(0L))).as("c"),
      sum(when(col("arm") === 1 && col("cv") === 0, lit(1L)).otherwise(lit(0L))).as("d"))
    def dd(n: String) = col(n).cast("double")
    val det = dd("a") * dd("d") - dd("b") * dd("c")
    val chi2 = (dd("a") + dd("b") + dd("c") + dd("d")) * det * det /
      ((dd("a") + dd("b")) * (dd("c") + dd("d")) *
        (dd("a") + dd("c")) * (dd("b") + dd("d")))
    val lift = dd("a") / (dd("a") + dd("b")) - dd("c") / (dd("c") + dd("d"))
    cells
      .filter(col("a") + col("b") > 0 && col("c") + col("d") > 0 &&
        col("a") + col("c") > 0 && col("b") + col("d") > 0)
      .select(col("a"), col("b"), col("c"), col("d"),
        round(lit(1e6) * chi2).cast("long").as("chi2_fp6"),
        round(lit(1e6) * lift).cast("long").as("lift_fp6"))
  }

  val q212ChiSquareSql: String =
    """WITH pc AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pc
      |  FROM events GROUP BY user_id),
      |tot AS (SELECT CAST(SUM(pc) AS BIGINT) AS p, COUNT(*) AS u FROM pc),
      |conv AS (
      |  SELECT user_id % 2 AS arm,
      |    CASE WHEN pc * u > p THEN 1 ELSE 0 END AS cv
      |  FROM pc CROSS JOIN tot),
      |c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 0 AND cv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN arm = 0 AND cv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN arm = 1 AND cv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(SUM(CASE WHEN arm = 1 AND cv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM conv)
      |SELECT a, b, c, d,
      |  CAST(round(1e6 * (
      |    (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
      |      + CAST(d AS DOUBLE))
      |    * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
      |       - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
      |    * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
      |       - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
      |    / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
      |       * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
      |       * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
      |       * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE))))) AS BIGINT)
      |    AS chi2_fp6,
      |  CAST(round(1e6 * (CAST(a AS DOUBLE) / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
      |    - CAST(c AS DOUBLE) / (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))))
      |    AS BIGINT) AS lift_fp6
      |FROM c
      |WHERE a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0""".stripMargin

  /** q221: calibration audit (reliability bins + expected calibration
    * error) of an empirical predictor over a time split: each user's
    * Laplace-smoothed purchase share over the first 14 days predicts the
    * probability that a later event of theirs is a purchase. Predictions
    * land in 10 equal-width bins; per bin we report mean confidence vs
    * observed accuracy, and ECE = Σ n_b/N·|acc_b − conf_b|. The predictor
    * is fp9-rounded ONCE at the user level, so every downstream mean is a
    * ratio of exact integers, and the per-bin |gap| is fp6-rounded before
    * the N-weighted combine — both cross-engine order-free.
    *
    * Scale: the history aggregate and the eval join both partition on
    * user_id (one shuffle each; AQE broadcasts the per-user predictor
    * when it fits); binning collapses to ≤10 rows before the global
    * window. The same shape audits any model whose scores are a column.
    */
  def q221CalibrationEce(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val base = e.crossJoin(broadcast(minDay))
      .select(col("user_id"),
        (datediff(to_date(col("ts")), col("d0")) >= 14).as("post"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("o"))
    val pred = base.filter(!col("post"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_h"), sum(col("o")).as("k_h"))
      .select(col("user_id"),
        round(lit(1e9) * (col("k_h") + 1).cast("double") /
          (col("n_h") + 5).cast("double")).cast("long").as("p9"))
    val bins = base.filter(col("post"))
      .join(pred, "user_id")
      .select(expr("least(p9 div 100000000, 9)").as("bin"),
        col("p9"), col("o"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("p9")).as("sp9"),
        sum(col("o")).as("so"))
    val conf = col("sp9").cast("double") / col("n_b").cast("double") / lit(1e9)
    val acc = col("so").cast("double") / col("n_b").cast("double")
    val wAll = Window.partitionBy()
    bins.select(col("bin"), col("n_b"),
        round(conf * lit(1e6)).cast("long").as("conf_fp6"),
        round(acc * lit(1e6)).cast("long").as("acc_fp6"),
        round(abs(acc - conf) * lit(1e6)).cast("long").as("gap_fp6"))
      .withColumn("ece_fp6",
        round(sum(col("n_b") * col("gap_fp6")).over(wAll).cast("double") /
          sum(col("n_b")).over(wAll).cast("double")).cast("long"))
  }

  /** Shared CTE chain for q221/q229: reliability grid `g` with per-bin
    * counts, confidence, accuracy, and gap. */
  private val q221GridSql: String =
    """WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |base AS (
      |  SELECT user_id,
      |    date_diff('day', d0.d0, ts::DATE) >= 14 AS post,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS o
      |  FROM events, d0),
      |p AS (
      |  SELECT user_id,
      |    CAST(round(1e9 * CAST(SUM(o) + 1 AS DOUBLE)
      |      / CAST(COUNT(*) + 5 AS DOUBLE)) AS BIGINT) AS p9
      |  FROM base WHERE NOT post GROUP BY 1),
      |b AS (
      |  SELECT LEAST(p.p9 // 100000000, 9) AS bin, COUNT(*) AS n_b,
      |    SUM(p.p9) AS sp9, SUM(base.o) AS so
      |  FROM base JOIN p ON base.user_id = p.user_id
      |  WHERE base.post GROUP BY 1),
      |g AS (
      |  SELECT bin, n_b,
      |    CAST(round(CAST(sp9 AS DOUBLE) / CAST(n_b AS DOUBLE) / 1e9 * 1e6)
      |      AS BIGINT) AS conf_fp6,
      |    CAST(round(CAST(so AS DOUBLE) / CAST(n_b AS DOUBLE) * 1e6)
      |      AS BIGINT) AS acc_fp6,
      |    CAST(round(abs(CAST(so AS DOUBLE) / CAST(n_b AS DOUBLE)
      |      - CAST(sp9 AS DOUBLE) / CAST(n_b AS DOUBLE) / 1e9) * 1e6)
      |      AS BIGINT) AS gap_fp6
      |  FROM b)""".stripMargin

  val q221CalibrationEceSql: String =
    s"""$q221GridSql
      |SELECT bin, n_b, conf_fp6, acc_fp6, gap_fp6,
      |  CAST(round(CAST(SUM(n_b * gap_fp6) OVER () AS DOUBLE)
      |    / CAST(SUM(n_b) OVER () AS DOUBLE)) AS BIGINT) AS ece_fp6
      |FROM g""".stripMargin

  // SPRT constants (H0: p=0.45 vs H1: p=0.55, α=β=0.1), fp9 integers
  // computed ONCE here and inlined into both engines' plans — the
  // log-likelihood walk is then exact integer arithmetic everywhere.
  private[queries] val sprtL1: Long = math.round(math.log(11.0 / 9.0) * 1e9)
  private[queries] val sprtL0: Long = math.round(math.log(9.0 / 11.0) * 1e9)
  private[queries] val sprtA9: Long = math.round(math.log(9.0) * 1e9)

  /** q225: sequential probability ratio test per event type — Wald's
    * SPRT on the Bernoulli stream x = (value > 50), H0: p = 0.45 vs
    * H1: p = 0.55 at α = β = 0.1. The log-likelihood ratio walks by the
    * fp9-integer increments above in (ts, event_id) order; the test
    * stops at the first index where |LLR| ≥ ln 9 and reports the
    * decision, stop index, and LLR at the stop (or `continue` if the
    * stream ends inside the band).
    *
    * Scale: the walk is a per-type running sum — the q174/q184 single-
    * ordering shape, and ~10 event types would pin the plain window's
    * sort to ~10 tasks at any cluster size (measured 4.1× growth at 10×
    * data in r13). It runs as
    * [[graft.ops.ShardedOrder.shardedPrefixSum]]: time-range buckets
    * give keys × buckets sort parallelism, per-bucket LLR totals fold
    * into exclusive prefix offsets at grid size, and the global walk is
    * restored arithmetically — provably cut-invariant (the offsets ARE
    * the missing prefix), so the UNCHANGED plain-window oracle
    * hash-certifies the substitution (the q174/q184 two-phase
    * discipline). The first crossing then comes from ONE aggregate —
    * `min(struct(rn, llr))` — instead of the plain form's min-rank +
    * corpus self-join, so the sharded form touches the corpus once
    * fewer than what it replaced. µs ordering: ts → unix_micros is
    * monotone injective, so (us, event_id) sorts exactly like the
    * oracle's (ts, event_id).
    */
  def q225Sprt(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"),
        when(col("value") > 50.0, lit(sprtL1)).otherwise(lit(sprtL0)).as("inc"))
    val cum = graft.ops.ShardedOrder.shardedPrefixSum(
      base, Seq("event_type"), "us", Seq("event_id"), col("inc"),
      "llr9", "rn", "n_all")
    val at = cum
      .filter(col("llr9") >= sprtA9 || col("llr9") <= -sprtA9)
      .groupBy(col("event_type"))
      .agg(min(struct(col("rn"), col("llr9"))).as("st"))
      .select(col("event_type"), col("st.rn").as("stop_rn"),
        col("st.llr9").as("llr9_at_stop"),
        when(col("st.llr9") >= sprtA9, lit("h1")).otherwise(lit("h0"))
          .as("decision"))
    Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .join(at, Seq("event_type"), "left")
      .select(col("event_type"), col("n_events"), col("stop_rn"),
        coalesce(col("decision"), lit("continue")).as("decision"),
        col("llr9_at_stop"))
  }

  val q225SprtSql: String =
    s"""WITH c AS (
       |  SELECT event_type,
       |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       |    CAST(SUM(CASE WHEN value > 50.0 THEN $sprtL1 ELSE $sprtL0 END)
       |      OVER w AS BIGINT) AS llr9
       |  FROM events
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
       |s AS (
       |  SELECT event_type, MIN(rn) AS stop_rn FROM c
       |  WHERE llr9 >= $sprtA9 OR llr9 <= -$sprtA9 GROUP BY 1),
       |a AS (
       |  SELECT c.event_type, s.stop_rn, c.llr9 AS llr9_at_stop,
       |    CASE WHEN c.llr9 >= $sprtA9 THEN 'h1' ELSE 'h0' END AS decision
       |  FROM c JOIN s ON c.event_type = s.event_type AND c.rn = s.stop_rn),
       |n AS (SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1)
       |SELECT n.event_type, n.n_events, a.stop_rn,
       |  COALESCE(a.decision, 'continue') AS decision, a.llr9_at_stop
       |FROM n LEFT JOIN a ON n.event_type = a.event_type""".stripMargin

  // qnorm(0.25): the N(0,1) lower-quartile breakpoint of the 4-letter
  // SAX alphabet, inlined identically into both engines
  private[queries] val saxBp: Double = -0.6744897501960817

  /** q226: SAX symbolization (Symbolic Aggregate approXimation) of each
    * event type's daily-mean series: daily means are µ-unit integers,
    * z-normalized per type against exact-integer moment sums, mapped to
    * the 4-letter alphabet at the N(0,1) quartile breakpoints, and
    * concatenated in day order into one word per type; the gate also
    * mines the modal trigram motif of each word. Lin & Keogh's SAX is
    * the standard pre-index for similarity search over time series —
    * symbolization makes subsequence matching a string problem.
    *
    * Scale: the corpus collapses to a types×days grid in the first
    * aggregate; everything after (z-scores, symbols, word assembly,
    * motif counting) is grid-sized. The word-assembly sort orders ≤days
    * elements per type inside an aggregated array — no row explosion.
    */
  def q226Sax(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * lit(1e6)).cast("long")).as("sv6"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("day"),
        round(col("sv6").cast("double") / col("n").cast("double"))
          .cast("long").as("m6"))
    val mom = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_days"),
      sum(col("m6").cast(DecimalType(38, 0))).as("s1"),
      sum(col("m6").cast(DecimalType(38, 0)) *
        col("m6").cast(DecimalType(38, 0))).as("s2"))
    val nD = col("n_days").cast("double")
    val mu = col("s1").cast("double") / nD
    val sigma = sqrt((col("n_days").cast(DecimalType(38, 0)) * col("s2") -
      col("s1") * col("s1")).cast("double")) / nD
    val z = (col("m6").cast("double") - col("mu")) / col("sigma")
    val sym = when(z < saxBp, "a").when(z < 0.0, "b")
      .when(z < -saxBp, "c").otherwise("d")
    val lettered = daily
      .join(mom.select(col("event_type"), col("n_days"),
        mu.as("mu"), sigma.as("sigma")), Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("day"), sym.as("sym"))
    val words = lettered.groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"),
        array_join(transform(
          array_sort(collect_list(struct(col("day"), col("sym")))),
          x => x.getField("sym")), "").as("sax"))
    val motifs = words
      .select(col("event_type"),
        explode(sequence(lit(1), length(col("sax")) - 2)).as("i"),
        col("sax"))
      .select(col("event_type"), expr("substring(sax, i, 3)").as("motif"))
      .groupBy(col("event_type"), col("motif"))
      .agg(count(lit(1)).as("motif_n"))
    val top = motifs.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("motif_n").desc, col("motif"))))
      .filter(col("rk") === 1).drop("rk")
    words.join(top, Seq("event_type"), "left")
      .select(col("event_type"), col("n_days"), col("sax"),
        col("motif"), col("motif_n"))
  }

  val q226SaxSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, ts::DATE AS day,
       |    CAST(round(CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS m6
       |  FROM events GROUP BY 1, 2),
       |mom AS (
       |  SELECT event_type, COUNT(*) AS n_days,
       |    SUM(CAST(m6 AS HUGEINT)) AS s1,
       |    SUM(CAST(m6 AS HUGEINT) * CAST(m6 AS HUGEINT)) AS s2
       |  FROM daily GROUP BY 1),
       |norm AS (
       |  SELECT event_type, n_days,
       |    CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS mu,
       |    sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE))
       |      / CAST(n_days AS DOUBLE) AS sigma
       |  FROM mom),
       |sym AS (
       |  SELECT d.event_type, n.n_days, d.day,
       |    CASE WHEN (CAST(d.m6 AS DOUBLE) - n.mu) / n.sigma < $saxBp THEN 'a'
       |         WHEN (CAST(d.m6 AS DOUBLE) - n.mu) / n.sigma < 0.0 THEN 'b'
       |         WHEN (CAST(d.m6 AS DOUBLE) - n.mu) / n.sigma < ${-saxBp}
       |           THEN 'c'
       |         ELSE 'd' END AS sym
       |  FROM daily d JOIN norm n ON d.event_type = n.event_type),
       |words AS (
       |  SELECT event_type, MAX(n_days) AS n_days,
       |    string_agg(sym, '' ORDER BY day) AS sax
       |  FROM sym GROUP BY 1),
       |mot AS (
       |  SELECT w.event_type, substring(w.sax, i.i, 3) AS motif,
       |    COUNT(*) AS motif_n
       |  FROM words w, LATERAL (SELECT unnest(generate_series(1,
       |    len(w.sax) - 2)) AS i) i
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT event_type, motif, motif_n FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY motif_n DESC, motif) AS rk FROM mot)
       |  WHERE rk = 1)
       |SELECT w.event_type, w.n_days, w.sax, t.motif, t.motif_n
       |FROM words w LEFT JOIN top t ON w.event_type = t.event_type""".stripMargin

  /** q229: isotonic (monotone non-decreasing) calibration of the q221
    * reliability bins, via the MINIMAX identity
    * iso(i) = max_{j≤i} min_{k≥i} mean(y over bins j..k) — the closed
    * form of the pool-adjacent-violators fit (PAVA), evaluated by brute
    * force over all (j,k) intervals of the ≤10-bin grid. StatGatesSpec
    * proves the identity by running ACTUAL exact-rational PAVA against
    * this output. Interval means are ratios of exact prefix-sum integers,
    * so both engines see identical doubles.
    *
    * Scale: everything after q221's user-level aggregate is grid-sized —
    * the interval enumeration is bins³ ≈ 1000 rows of arithmetic. This
    * is how monotone calibrators (Zadrozny–Elkan) are fitted to binned
    * model scores at any corpus size.
    */
  def q229Isotonic(spark: SparkSession, dir: String): DataFrame = {
    val bins = q221CalibrationEce(spark, dir)
      .select(col("bin"), col("n_b"), col("acc_fp6"))
      // ≤10 rows, feeds the interval grid three ways. coalesce(1) BEFORE
      // the barrier: the grid below crossJoins this table with itself
      // twice, and cartesian partition counts MULTIPLY — a bins table
      // that inherits the corpus shuffle partitioning turns the trivial
      // grid into partitions³ empty tasks (measured 10.4 s vs 0.6 s at
      // sf1 under the AQE-off bench session, whose coalescer otherwise
      // hid it). Grid work must declare its grid size, not inherit the
      // corpus's.
      .coalesce(1)
      .localCheckpoint()
    // interval sums via a small self-join: for (j,k) sum bins in range
    val sums = bins.select(col("bin"), col("n_b"),
        (col("acc_fp6") * col("n_b")).as("y6w"))
      .crossJoin(bins.select(col("bin").as("j")))
      .crossJoin(bins.select(col("bin").as("k")))
      .filter(col("j") <= col("k") && col("bin") >= col("j") &&
        col("bin") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg(sum(col("n_b")).as("nw"), sum(col("y6w")).as("yw"))
      .select(col("j"), col("k"),
        (col("yw").cast("double") / col("nw").cast("double")).as("avg6"))
    val inner = bins.select(col("bin"))
      .join(sums, col("j") <= col("bin") && col("k") >= col("bin"))
      .groupBy(col("bin"), col("j")).agg(min(col("avg6")).as("mn"))
    val iso = inner.groupBy(col("bin")).agg(max(col("mn")).as("iso6d"))
    bins.join(iso, Seq("bin"))
      .select(col("bin"), col("n_b"), col("acc_fp6"),
        round(col("iso6d")).cast("long").as("iso_fp6"))
  }

  val q229IsotonicSql: String =
    s"""$q221GridSql,
       |bins AS (SELECT bin, n_b, acc_fp6 FROM g),
       |sums AS (
       |  SELECT j.bin AS j, k.bin AS k,
       |    CAST(SUM(b.acc_fp6 * b.n_b) AS DOUBLE)
       |      / CAST(SUM(b.n_b) AS DOUBLE) AS avg6
       |  FROM bins b, bins j, bins k
       |  WHERE j.bin <= k.bin AND b.bin >= j.bin AND b.bin <= k.bin
       |  GROUP BY 1, 2),
       |inner_ AS (
       |  SELECT i.bin, s.j, MIN(s.avg6) AS mn
       |  FROM bins i JOIN sums s ON s.j <= i.bin AND s.k >= i.bin
       |  GROUP BY 1, 2),
       |iso AS (SELECT bin, MAX(mn) AS iso6d FROM inner_ GROUP BY 1)
       |SELECT b.bin, b.n_b, b.acc_fp6,
       |  CAST(round(i.iso6d) AS BIGINT) AS iso_fp6
       |FROM bins b JOIN iso i ON b.bin = i.bin""".stripMargin

  /** q230: ROC AUC of the q221 predictor on the evaluation split,
    * computed tie-correctly from the SCORE HISTOGRAM: per distinct
    * fp9 score, (positives, negatives); doubled Mann–Whitney
    * U₂ = Σ_s n1_s·(2·cumN0_below + n0_s) keeps the ½-tie term exact in
    * integers, and AUC = U₂/(2·N1·N0). The corpus never gets a global
    * rank — the one ordered step is a window over the ≤users-sized
    * distinct-score grid (the q153/q166 bounded-histogram discipline,
    * exactly what q174's full ranking had to shard to avoid).
    */
  def q230Auc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val base = e.crossJoin(broadcast(minDay))
      .select(col("user_id"),
        (datediff(to_date(col("ts")), col("d0")) >= 14).as("post"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("o"))
    val pred = base.filter(!col("post"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_h"), sum(col("o")).as("k_h"))
      .select(col("user_id"),
        round(lit(1e9) * (col("k_h") + 1).cast("double") /
          (col("n_h") + 5).cast("double")).cast("long").as("p9"))
    val hist = base.filter(col("post")).join(pred, "user_id")
      .groupBy(col("p9"))
      .agg(sum(col("o")).as("n1"), sum(lit(1L) - col("o")).as("n0"))
    val wOrd = Window.orderBy(col("p9"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u2 = hist
      .withColumn("cum0", sum(col("n0")).over(wOrd) - col("n0"))
      .select((col("n1") * (lit(2L) * col("cum0") + col("n0"))).as("t"),
        col("n1"), col("n0"))
      .agg(sum(col("t")).as("u2"), sum(col("n1")).as("nn1"),
        sum(col("n0")).as("nn0"))
    u2.select(col("nn1").as("n_pos"), col("nn0").as("n_neg"),
      round(lit(1e6) * col("u2").cast("double") /
        (lit(2.0) * col("nn1").cast("double") * col("nn0").cast("double")))
        .cast("long").as("auc_fp6"))
  }

  /** q240: decile gains table of the q221 predictor — users ranked by
    * predicted purchase propensity, cut into 10 equal-rank deciles; each
    * row reports the decile's evaluation-split event/purchase counts,
    * rate, and the CUMULATIVE lift over the overall rate (the marketing
    * "if we only touch the top k/10 of users" curve — the thresholded
    * companion to q230's threshold-free AUC).
    *
    * Scale: the rank window runs over the USERS grid, never the corpus
    * (ShardedOrder.shardedRowNumber is the 100 TB path); eval events
    * join the per-user decile by user_id; the gains arithmetic is a
    * 10-row window.
    */
  def q240Gains(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val base = e.crossJoin(broadcast(minDay))
      .select(col("user_id"),
        (datediff(to_date(col("ts")), col("d0")) >= 14).as("post"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("o"))
    val pred = base.filter(!col("post"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_h"), sum(col("o")).as("k_h"))
      .select(col("user_id"),
        round(lit(1e9) * (col("k_h") + 1).cast("double") /
          (col("n_h") + 5).cast("double")).cast("long").as("p9"))
    val nU = pred.agg(count(lit(1)).as("n_users"))
    val ranked = pred
      .withColumn("rk", row_number().over(
        Window.orderBy(col("p9").desc, col("user_id"))).cast("long"))
      .crossJoin(broadcast(nU))
      .select(col("user_id"),
        expr("((rk - 1) * 10) div n_users").as("decile"))
    val cells = base.filter(col("post")).join(ranked, "user_id")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_events"), sum(col("o")).as("n_purch"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    cells
      .withColumn("ce", sum(col("n_events")).over(wCum))
      .withColumn("cp", sum(col("n_purch")).over(wCum))
      .withColumn("te", sum(col("n_events")).over(wAll))
      .withColumn("tp", sum(col("n_purch")).over(wAll))
      .select(col("decile"), col("n_events"), col("n_purch"),
        round(lit(1e6) * col("n_purch").cast("double") /
          col("n_events").cast("double")).cast("long").as("rate_fp6"),
        round(lit(1e6) *
          (col("cp").cast("double") / col("ce").cast("double")) /
          (col("tp").cast("double") / col("te").cast("double")))
          .cast("long").as("cum_lift_fp6"))
  }

  val q240GainsSql: String =
    s"""$q221GridSql,
      |nu AS (SELECT COUNT(*) AS n_users FROM p),
      |rk AS (
      |  SELECT user_id,
      |    ((ROW_NUMBER() OVER (ORDER BY p9 DESC, user_id) - 1) * 10)
      |      // nu.n_users AS decile
      |  FROM p, nu),
      |cells AS (
      |  SELECT rk.decile, COUNT(*) AS n_events,
      |    CAST(SUM(base.o) AS BIGINT) AS n_purch
      |  FROM base JOIN rk ON base.user_id = rk.user_id
      |  WHERE base.post GROUP BY 1),
      |cum AS (
      |  SELECT decile, n_events, n_purch,
      |    CAST(SUM(n_events) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ce,
      |    CAST(SUM(n_purch) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
      |    CAST(SUM(n_events) OVER () AS BIGINT) AS te,
      |    CAST(SUM(n_purch) OVER () AS BIGINT) AS tp
      |  FROM cells)
      |SELECT decile, n_events, n_purch,
      |  CAST(round(1e6 * CAST(n_purch AS DOUBLE)
      |    / CAST(n_events AS DOUBLE)) AS BIGINT) AS rate_fp6,
      |  CAST(round(1e6 * (CAST(cp AS DOUBLE) / CAST(ce AS DOUBLE))
      |    / (CAST(tp AS DOUBLE) / CAST(te AS DOUBLE))) AS BIGINT)
      |    AS cum_lift_fp6
      |FROM cum""".stripMargin

  /** q234: simple exponential smoothing (α = 0.3) of each event type's
    * daily-count series — the next-day forecast l_T and the one-step-
    * ahead MAE, the pair a capacity monitor alarms on. The recursion
    * l_t = α·y_t + (1−α)·l_{t−1} is UNROLLED into its closed weighted
    * sum l_t = Σ_j α(1−α)^{t−j} y_j + (1−α)^t·y_0 over the observed
    * per-type series (index-based, gap-free via a grid row_number), so
    * the sequential dependence becomes one grid self-join: weights are
    * fp12-quantized per lag, levels are exact Decimal sums, and one-step
    * errors |y·10¹² − l12| are exact integer arithmetic on both engines.
    *
    * Scale: the corpus collapses to the types×days grid first; the
    * unrolled join is grid², still types×days²-sized — the standard way
    * to de-sequentialize smoothing for a parallel engine (segmented-scan
    * at larger horizons).
    */
  def q234Ses(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val e = Tables.events(spark, dir)
    val minDay = e.agg(min(to_date(col("ts"))).as("d0"))
    val daily = e.crossJoin(broadcast(minDay))
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), col("d0")).cast("long").as("d"))
      .agg(count(lit(1)).as("y"))
      .withColumn("r", (row_number().over(Window
        .partitionBy(col("event_type")).orderBy(col("d"))) - 1)
        .cast("long"))
      .localCheckpoint() // types×days grid; feeds init, pairs, and errors
    val wTail = round(lit(0.3) *
      pow(lit(0.7), (col("r") - col("rj")).cast("double")) * lit(1e12))
      .cast("long")
    val tails = daily.select(col("event_type"), col("r"))
      .join(daily.select(col("event_type"), col("r").as("rj"),
        col("y").as("yj")), Seq("event_type"))
      .filter(col("rj") >= 1 && col("rj") <= col("r"))
      .select(col("event_type"), col("r"),
        (wTail.cast(DecimalType(38, 0)) * col("yj")).as("term"))
      .groupBy(col("event_type"), col("r")).agg(sum(col("term")).as("sj"))
    val init = daily.filter(col("r") === 0)
      .select(col("event_type"), col("y").as("y0"))
    val wInit = round(pow(lit(0.7), col("r").cast("double")) * lit(1e12))
      .cast("long")
    val l = daily.select(col("event_type"), col("r"))
      .join(tails, Seq("event_type", "r"), "left")
      .join(broadcast(init), Seq("event_type"))
      .select(col("event_type"), col("r"),
        (coalesce(col("sj"), lit(0).cast(DecimalType(38, 0))) +
          wInit.cast(DecimalType(38, 0)) * col("y0")).as("l12"))
      .localCheckpoint() // level table: forecast + error branches
    val nDays = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), max(col("r")).as("rmax"))
    val fc = l.join(nDays, l("event_type") === nDays("event_type") &&
        l("r") === nDays("rmax"))
      .select(l("event_type"), col("n_days"),
        round(col("l12").cast("double") / lit(1e6)).cast("long")
          .as("forecast_fp6"))
    val er = daily.select(col("event_type"), col("r"), col("y"))
      .join(l.select(col("event_type"), (col("r") + 1).as("r"),
        col("l12").as("lp12")), Seq("event_type", "r"))
      .select(col("event_type"),
        abs(col("y").cast(DecimalType(38, 0)) * lit(1e12).cast("long") -
          col("lp12")).as("ae"))
      .groupBy(col("event_type"))
      .agg(sum(col("ae")).as("se"), count(lit(1)).as("ne"))
    fc.join(er, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("forecast_fp6"),
        round(col("se").cast("double") / col("ne").cast("double") /
          lit(1e6)).cast("long").as("mae_fp6"))
  }

  val q234SesSql: String =
    """WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |daily AS MATERIALIZED (
      |  SELECT event_type, d, y,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1
      |      AS BIGINT) AS r
      |  FROM (
      |    SELECT event_type,
      |      CAST(date_diff('day', d0.d0, ts::DATE) AS BIGINT) AS d,
      |      COUNT(*) AS y
      |    FROM events, d0 GROUP BY 1, 2)),
      |tails AS (
      |  SELECT t.event_type, t.r,
      |    SUM(CAST(round(0.3 * pow(0.7, CAST(t.r - j.r AS DOUBLE)) * 1e12)
      |      AS BIGINT) * CAST(j.y AS HUGEINT)) AS sj
      |  FROM daily t JOIN daily j ON j.event_type = t.event_type
      |    AND j.r >= 1 AND j.r <= t.r
      |  GROUP BY 1, 2),
      |l AS MATERIALIZED (
      |  SELECT t.event_type, t.r,
      |    COALESCE(s.sj, 0) + CAST(round(pow(0.7, CAST(t.r AS DOUBLE))
      |      * 1e12) AS BIGINT) * CAST(i.y AS HUGEINT) AS l12
      |  FROM daily t
      |  LEFT JOIN tails s ON s.event_type = t.event_type AND s.r = t.r
      |  JOIN (SELECT event_type, y FROM daily WHERE r = 0) i
      |    ON i.event_type = t.event_type),
      |f AS (
      |  SELECT event_type, COUNT(*) AS n_days, MAX(r) AS rmax
      |  FROM daily GROUP BY 1),
      |fc AS (
      |  SELECT l.event_type, f.n_days,
      |    CAST(round(CAST(l.l12 AS DOUBLE) / 1e6) AS BIGINT)
      |      AS forecast_fp6
      |  FROM l JOIN f ON l.event_type = f.event_type AND l.r = f.rmax),
      |er AS (
      |  SELECT y.event_type,
      |    SUM(ABS(CAST(y.y AS HUGEINT) * 1000000000000 - lp.l12)) AS se,
      |    COUNT(*) AS ne
      |  FROM daily y JOIN l lp ON lp.event_type = y.event_type
      |    AND lp.r = y.r - 1
      |  GROUP BY 1)
      |SELECT fc.event_type, fc.n_days, fc.forecast_fp6,
      |  CAST(round(CAST(er.se AS DOUBLE) / CAST(er.ne AS DOUBLE) / 1e6)
      |    AS BIGINT) AS mae_fp6
      |FROM fc JOIN er ON fc.event_type = er.event_type""".stripMargin

  val q230AucSql: String =
    """WITH d0 AS (SELECT MIN(ts::DATE) AS d0 FROM events),
      |base AS (
      |  SELECT user_id,
      |    date_diff('day', d0.d0, ts::DATE) >= 14 AS post,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS o
      |  FROM events, d0),
      |p AS (
      |  SELECT user_id,
      |    CAST(round(1e9 * CAST(SUM(o) + 1 AS DOUBLE)
      |      / CAST(COUNT(*) + 5 AS DOUBLE)) AS BIGINT) AS p9
      |  FROM base WHERE NOT post GROUP BY 1),
      |h AS (
      |  SELECT p.p9, CAST(SUM(base.o) AS BIGINT) AS n1,
      |    CAST(SUM(1 - base.o) AS BIGINT) AS n0
      |  FROM base JOIN p ON base.user_id = p.user_id
      |  WHERE base.post GROUP BY 1),
      |c AS (
      |  SELECT p9, n1, n0,
      |    CAST(SUM(n0) OVER (ORDER BY p9 ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) - n0 AS BIGINT) AS cum0
      |  FROM h),
      |u AS (
      |  SELECT CAST(SUM(n1 * (2 * cum0 + n0)) AS BIGINT) AS u2,
      |    CAST(SUM(n1) AS BIGINT) AS nn1, CAST(SUM(n0) AS BIGINT) AS nn0
      |  FROM c)
      |SELECT nn1 AS n_pos, nn0 AS n_neg,
      |  CAST(round(1e6 * CAST(u2 AS DOUBLE)
      |    / (2.0 * CAST(nn1 AS DOUBLE) * CAST(nn0 AS DOUBLE))) AS BIGINT)
      |    AS auc_fp6
      |FROM u""".stripMargin
}
