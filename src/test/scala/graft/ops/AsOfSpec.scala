package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, "A", ts("2024-01-01 10:00:00"), 100.0),
    (2L, "A", ts("2024-01-01 10:05:00"), 101.0),
    (3L, "A", ts("2024-01-01 10:10:00"), 102.0),
    (4L, "B", ts("2024-01-01 10:03:00"), 50.0)
  ).toDF("qid", "key", "qts", "px")

  private val trades = Seq(
    (10L, "A", ts("2024-01-01 10:07:00")), // between quotes 2 and 3 -> 2
    (11L, "A", ts("2024-01-01 10:05:00")), // exactly at quote 2
    (12L, "A", ts("2024-01-01 09:00:00")), // before any quote -> null
    (13L, "B", ts("2024-01-01 11:00:00")), // -> quote 4
    (14L, "C", ts("2024-01-01 11:00:00"))  // no quotes for key -> null
  ).toDF("tid", "key", "tts")

  test("inclusive as-of: latest quote at-or-before each trade") {
    val out = AsOf.joinPrior(trades, quotes, Seq("key"), "tts", "qts",
        rightTieBreak = Seq("qid"))
      .select(col("tid"), col("asof.qid").as("qid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(10L) === Some(2L))
    assert(out(11L) === Some(2L)) // ties are inclusive
    assert(out(12L) === None)
    assert(out(13L) === Some(4L))
    assert(out(14L) === None)
  }

  test("strict as-of excludes equal timestamps") {
    val out = AsOf.joinPrior(trades, quotes, Seq("key"), "tts", "qts",
        rightTieBreak = Seq("qid"), strict = true)
      .select(col("tid"), col("asof.qid").as("qid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(11L) === Some(1L)) // quote at 10:05 no longer eligible
    assert(out(10L) === Some(2L))
  }

  test("duplicate right timestamps resolve by tie-break (max id wins)") {
    val dupQuotes = quotes.union(
      Seq((5L, "A", ts("2024-01-01 10:05:00"), 200.0)).toDF("qid", "key", "qts", "px"))
    val out = AsOf.joinPrior(trades, dupQuotes, Seq("key"), "tts", "qts",
        rightTieBreak = Seq("qid"))
      .select(col("tid"), col("asof.qid").as("qid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(11L) === Some(5L))
  }

  // ---- native (custom LogicalPlan + SparkStrategy + SparkPlan) path ----

  private def bothForms(strict: Boolean) = {
    def run(f: Boolean) =
      (if (f) AsOf.joinPriorNative(trades, quotes, Seq("key"), "tts", "qts",
          rightTieBreak = Seq("qid"), strict = strict)
       else AsOf.joinPrior(trades, quotes, Seq("key"), "tts", "qts",
          rightTieBreak = Seq("qid"), strict = strict))
        .select(col("tid"), col("asof.qid").as("qid"), col("asof.px").as("px"))
        .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    (run(true), run(false))
  }

  test("native as-of join equals the window form (inclusive and strict)") {
    val (nInc, wInc) = bothForms(strict = false)
    assert(nInc === wInc)
    val (nStr, wStr) = bothForms(strict = true)
    assert(nStr === wStr)
  }

  test("native as-of join equals the window form on the events corpus") {
    val e = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val others = e.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts", "event_type")
    def run(native: Boolean) =
      (if (native) AsOf.joinPriorNative(purchases, others, Seq("user_id"),
          "ts", "ts", rightTieBreak = Seq("event_id"))
       else AsOf.joinPrior(purchases, others, Seq("user_id"),
          "ts", "ts", rightTieBreak = Seq("event_id")))
        .select(col("event_id"), col("asof.event_id").as("prior_id"),
          col("asof.event_type").as("prior_type"))
        .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    val n = run(true)
    assert(n.nonEmpty)
    assert(n === run(false))
  }

  test("native as-of join handles empty right side and null times") {
    val noQuotes = quotes.filter(col("qid") < 0)
    val out = AsOf.joinPriorNative(trades, noQuotes, Seq("key"), "tts", "qts")
      .select(col("tid"), col("asof.qid").as("qid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out.size === 5 && out.values.forall(_.isEmpty))
    // null right time sorts first (nulls-first) -> eligible for every left
    // row of its key; matches the window form
    val nullQuote = Seq((9L, "A", Option.empty[Timestamp], 1.0))
      .toDF("qid", "key", "qts", "px")
    def run(native: Boolean) =
      (if (native) AsOf.joinPriorNative(trades, nullQuote, Seq("key"), "tts", "qts")
       else AsOf.joinPrior(trades, nullQuote, Seq("key"), "tts", "qts"))
        .select(col("tid"), col("asof.qid").as("qid"))
        .as[(Long, Option[Long])].collect().toMap
    val n = run(true)
    assert(n(12L) === Some(9L)) // even the pre-open trade sees the null-ts row
    assert(n === run(false))
  }

  test("native as-of plan: AsOfJoinExec with per-side shuffles, no union") {
    val df = AsOf.joinPriorNative(trades, quotes, Seq("key"), "tts", "qts")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical) // nodeName drops Exec
    assert(!physical.contains("Union"), physical)
  }

  // ---- SQL table-function surface (graft_asof) ----

  test("graft_asof TVF equals the DataFrame-native form") {
    trades.createOrReplaceTempView("asof_tvf_trades")
    quotes.createOrReplaceTempView("asof_tvf_quotes")
    val sql = spark.sql(
      """SELECT tid, asof.qid AS qid
        |FROM graft_asof('asof_tvf_trades', 'asof_tvf_quotes',
        |                'key', 'tts', 'qts', 'qid')""".stripMargin)
      .as[(Long, Option[Long])].collect().toMap
    val api = AsOf.joinPriorNative(trades, quotes, Seq("key"), "tts", "qts",
        rightTieBreak = Seq("qid"))
      .select(col("tid"), col("asof.qid").as("qid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(sql === api)
    // strict variant via the 7th boolean-literal argument
    val strict = spark.sql(
      """SELECT tid, asof.qid AS qid
        |FROM graft_asof('asof_tvf_trades', 'asof_tvf_quotes',
        |                'key', 'tts', 'qts', 'qid', true)""".stripMargin)
      .as[(Long, Option[Long])].collect().toMap
    assert(strict(11L) === Some(1L)) // 10:05 quote excluded under strict <
  }

  test("graft_asof TVF rejects bad arity and non-literal args") {
    trades.createOrReplaceTempView("asof_tvf_trades")
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof('asof_tvf_trades')").collect())
    assert(e.getMessage.contains("graft_asof") || e.getMessage.contains("usage"),
      e.getMessage)
  }
}
