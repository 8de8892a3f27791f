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
}
