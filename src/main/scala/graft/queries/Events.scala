package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}

/** Event-stream semantics in batch form (SURVEY §2.9 [extension]): tumbling
  * event-time windows, JSON property extraction (`events.props` — the
  * reference's F9 `from_json` family), and session windows. The same
  * transforms run under Structured Streaming in [[graft.streaming]]; here
  * they are batch queries so the DuckDB oracle can gate them.
  *
  * Timestamps are emitted as formatted strings: the corpus carries
  * nanosecond precision which Spark truncates to µs while DuckDB keeps ns —
  * raw timestamp output could never hash-match.
  */
object Events {

  import Det._

  /** Tumbling 1-hour event-time window per event type. */
  def q13Tumbling(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  val q13TumblingSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** JSON property extraction + aggregation (reference F9). */
  def q14JsonProps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
  }

  val q14JsonPropsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k,
      |  MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type""".stripMargin

  /** Semi-structured props through Spark 4's VARIANT type — the modern
    * engine path next to q14's per-path string extraction: `parse_json`
    * parses each document ONCE into the binary variant encoding, then
    * `variant_get` does typed field access on the parsed form. At scale
    * that inverts the cost model of `get_json_object` (which re-parses
    * the string per path): k extractions cost one parse + k binary
    * probes. Same aggregate surface as q14, so the oracle certifies the
    * whole variant encode/decode round-trip against DuckDB's native JSON
    * operators. */
  def q71VariantProps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("k")).as("n_present"))
  }

  val q71VariantPropsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
      |  COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_present
      |FROM events
      |GROUP BY event_type""".stripMargin

  /** Session windows per user, 30-minute inactivity gap: the real
    * `session_window` operator; the oracle reproduces it with
    * gaps-and-islands SQL. */
  def q15Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("session_value"))
  }

  val q15SessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |numbered AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM marked)
      |SELECT user_id,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      |FROM numbered
      |GROUP BY user_id, sess""".stripMargin
}
