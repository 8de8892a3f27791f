package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ThetaSpec extends SparkSpec {
  import spark.implicits._
  import ThetaFunctions._

  private def est(bytes: Array[Byte]): Double = ThetaOps.summary(bytes)(0)

  test("below nominal capacity the sketch is exact; partitioning-independent") {
    val ids = (1L to 1000L).map(i => i % 300) // 300 distinct
    val a = ids.toDF("id").repartition(13)
      .agg(theta_sketch_agg(col("id"), 12)).head().getAs[Array[Byte]](0)
    val b = ids.toDF("id").coalesce(1)
      .agg(theta_sketch_agg(col("id"), 12)).head().getAs[Array[Byte]](0)
    assert(est(a) === 300.0)
    assert(est(a) === est(b))       // KMV retained set is order-free
  }

  test("union of per-batch sketches equals the single-pass sketch") {
    val batches = Seq((1L to 400L), (201L to 600L)).map(r =>
      r.toDF("id").agg(theta_sketch_agg(col("id"), 12))
        .head().getAs[Array[Byte]](0))
    val merged = batches.toDF("sk")
      .agg(theta_union_agg(col("sk"), 12)).head().getAs[Array[Byte]](0)
    assert(est(merged) === 600.0)   // |1..600|, overlap deduped
  }

  test("intersection is exact below capacity") {
    def sk(r: Range) = r.map(_.toLong).toDF("id")
      .agg(theta_sketch_agg(col("id"), 12)).head().getAs[Array[Byte]](0)
    val inter = ThetaOps.intersectBytes(sk(1 to 500), sk(301 to 800))
    assert(est(inter) === 200.0)    // |301..500|
    // exact mode: every bound collapses to the estimate, so the q161/q162
    // 3-sigma bracket doubles as an exactness assertion below capacity
    val s = ThetaOps.summary(inter)
    assert(s(1) === s(0) && s(2) === s(0) && s(3) === s(0) && s(4) === s(0))
  }

  test("estimation mode: 2-sigma bounds bracket the truth") {
    // lgK=4 (nominal 16) over 5000 distinct keys forces estimation
    val n = 5000L
    val bytes = (1L to n).toDF("id")
      .agg(theta_sketch_agg(col("id"), 4)).head().getAs[Array[Byte]](0)
    val Array(e, lb, ub, lb3, ub3) = ThetaOps.summary(bytes)
    assert(lb <= n && n <= ub, s"bounds [$lb, $ub] miss $n")
    assert(lb < e && e < ub)
    assert(lb3 <= lb && ub <= ub3, "3-sigma bracket must contain 2-sigma")
    assert(math.abs(e - n) / n < 0.9) // sanity: order of magnitude right
  }

  test("theta functions are callable from SQL") {
    ThetaFunctions.register(spark)
    val e = spark.sql(
      """SELECT theta_summary(theta_intersect(
        |  (SELECT theta_sketch_agg(id, 12) FROM range(0, 100)),
        |  (SELECT theta_sketch_agg(id, 12) FROM range(50, 200))))[0] AS est
        |""".stripMargin).head().getDouble(0)
    assert(e === 50.0)
  }
}
