package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KllSpec extends SparkSpec {
  import spark.implicits._
  import KllFunctions._

  test("sketch of 1..10000: every decile estimate within rank bound") {
    val df = (1 to 10000).map(_.toDouble).toDF("x")
    val sk = df.agg(kll_sketch_agg(col("x"), 200).as("sk"))
    val ests = sk.select(
      (1 to 9).map(d => kll_quantile(col("sk"), lit(d / 10.0)).as(s"p$d")): _*)
      .collect().head
    (1 to 9).foreach { d =>
      val est = ests.getDouble(d - 1)
      // k=200 ⇒ ~1.65% rank error @99%; 3% here is generous but real
      assert(math.abs(est / 10000.0 - d / 10.0) < 0.03, s"p$d=$est")
    }
  }

  test("merged per-group sketches match the single-pass sketch's contract") {
    val df = (1 to 20000).map(i => (i % 7, i.toDouble)).toDF("g", "x")
    val merged = df.groupBy(col("g")).agg(kll_sketch_agg(col("x"), 200).as("sk"))
      .agg(kll_merge_agg(col("sk"), 200).as("sk"))
    val row = merged.select(
      kll_sketch_n(col("sk")).as("n"),
      kll_quantile(col("sk"), lit(0.5)).as("p50")).collect().head
    assert(row.getLong(0) == 20000L, "merge must keep the exact count")
    assert(math.abs(row.getDouble(1) / 20000.0 - 0.5) < 0.03)
  }

  test("SQL surface: kll_* callable from pure SQL via extensions") {
    (1 to 1000).map(i => (i % 3, i.toDouble)).toDF("g", "x")
      .createOrReplaceTempView("kll_in")
    val out = spark.sql(
      """SELECT kll_sketch_n(sk) AS n, kll_quantile(sk, 0.5d) AS p50
        |FROM (SELECT kll_merge_agg(psk, 200) AS sk
        |      FROM (SELECT g, kll_sketch_agg(x, 200) AS psk
        |            FROM kll_in GROUP BY g))""".stripMargin).collect().head
    assert(out.getLong(0) == 1000L)
    assert(math.abs(out.getDouble(1) - 500.0) < 50.0)
  }

  test("empty input: quantile is NULL, n is 0; nulls in input are skipped") {
    val empty = Seq.empty[Double].toDF("x")
      .agg(kll_sketch_agg(col("x"), 200).as("sk"))
      .select(kll_quantile(col("sk"), lit(0.5)).as("p50"),
        kll_sketch_n(col("sk")).as("n")).collect().head
    assert(empty.isNullAt(0) && empty.getLong(1) == 0L)

    val withNulls = Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("x")
      .agg(kll_sketch_agg(col("x"), 200).as("sk"))
      .select(kll_sketch_n(col("sk"))).collect().head
    assert(withNulls.getLong(0) == 2L, "nulls must not count")
  }

  test("serde roundtrip through parquet: the artifact pattern") {
    val dir = tmpDir("kll")
    (1 to 5000).map(i => (i % 4, i.toDouble)).toDF("batch", "x")
      .groupBy(col("batch")).agg(kll_sketch_agg(col("x"), 200).as("sk"))
      .write.mode("overwrite").parquet(s"$dir/sketches")
    // a later job unions persisted per-batch sketches — no raw re-scan
    val n = spark.read.parquet(s"$dir/sketches")
      .agg(kll_merge_agg(col("sk"), 200).as("sk"))
      .select(kll_sketch_n(col("sk"))).collect().head.getLong(0)
    assert(n == 5000L)
  }
}
