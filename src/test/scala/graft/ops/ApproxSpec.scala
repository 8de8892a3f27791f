package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("HLL distinct within 5% of exact on lineitem keys") {
    val l = Tables.lineitem(spark, sf)
    val r = l.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      Approx.distinctCount(col("l_orderkey")).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx percentiles straddle the exact interpolated values") {
    val l = Tables.lineitem(spark, sf)
    val r = l.agg(
      expr("percentile(l_quantity, 0.5)").as("exact_p50"),
      Approx.percentiles(col("l_quantity"), Seq(0.5)).as("ap")).collect().head
    val exact = r.getDouble(0)
    val approx = r.getSeq[Double](1).head
    assert(math.abs(approx - exact) <= 1.0, s"exact=$exact approx=$approx")
  }

  test("profile emits one row per group with sane fields") {
    val p = Approx.profile(Tables.lineitem(spark, sf), Seq("l_returnflag"), "l_quantity")
      .collect()
    assert(p.length === 3)
    p.foreach { r => assert(r.getLong(1) > 0 && r.getLong(2) > 0) }
  }
}
