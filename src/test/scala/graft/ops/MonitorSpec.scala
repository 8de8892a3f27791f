package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MonitorSpec extends SparkSpec {
  import spark.implicits._

  private def psiMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    Monitor.psiByGroup(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("identical per-group distributions score ~zero PSI") {
    // both groups: 50 rows in bucket 1, 50 in bucket 2 — shares match the
    // corpus exactly, so every (p - q) term is 0 up to smoothing noise
    val df = (1 to 50).flatMap(_ => Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)))
      .toDF("g", "v")
    val psi = psiMap(df)
    assert(psi.keySet == Set("a", "b"))
    // smoothing uses the same +0.5 on both sides of matched 100-row groups
    psi.values.foreach(v => assert(math.abs(v) < 1000000L, s"psi_fp9=$v"))
  }

  test("a shifted group scores strictly higher than a matched one") {
    val base = (1 to 50).flatMap(_ => Seq(("a", 1), ("a", 2)))
    val matched = (1 to 50).flatMap(_ => Seq(("b", 1), ("b", 2)))
    val shifted = (1 to 100).map(_ => ("c", 1)) // all mass in one bucket
    val psi = psiMap((base ++ matched ++ shifted).toDF("g", "v"))
    assert(psi("c") > psi("a"))
    assert(psi("c") > psi("b"))
    // industry rule of thumb: PSI > 0.25 = major shift; c is fully shifted
    assert(psi("c") > (0.25 * 1e9).toLong)
  }

  test("groups missing whole buckets still produce finite terms") {
    // group b never sees buckets 2 or 3: smoothing must keep ln() finite
    val df = ((1 to 30).map(_ => ("a", 1)) ++ (1 to 30).map(_ => ("a", 2)) ++
      (1 to 30).map(_ => ("a", 3)) ++ (1 to 90).map(_ => ("b", 1))).toDF("g", "v")
    val rows = Monitor.psiByGroup(df, "g", col("v")).collect()
    assert(rows.length == 2)
    rows.foreach { case Row(_, n: Long, psi: Long) =>
      assert(n == 90L)
      assert(psi != Long.MaxValue && psi != Long.MinValue)
    }
  }

  test("one output row per group with the exact group count") {
    val df = Seq(("a", 1), ("a", 9), ("b", 1)).toDF("g", "v")
    val rows = Monitor.psiByGroup(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a" -> 2L, "b" -> 1L))
  }
}
