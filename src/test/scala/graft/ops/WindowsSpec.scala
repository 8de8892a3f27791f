package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def prices() = Seq(
    ("AAPL", Date.valueOf("2024-06-03"), 100.0),
    ("AAPL", Date.valueOf("2024-06-04"), 110.0),
    ("AAPL", Date.valueOf("2024-06-05"), 120.0),
    ("MSFT", Date.valueOf("2024-06-03"), 400.0)
  ).toDF("stock_ticker", "stock_date", "stock_close")

  test("stock_30daymean: expanding mean until 30 rows, dif is close-mean") {
    val out = Windows.stockRollingFeatures(prices())
      .filter($"stock_ticker" === "AAPL").orderBy($"stock_date")
      .select("stock_30daymean", "stock_dif_mean").as[(Double, Double)].collect()
    assert(out(0) === ((100.0, 0.0)))
    assert(out(1) === ((105.0, 5.0)))
    assert(out(2) === ((110.0, 10.0)))
  }

  test("dailyReturns: first day null, others close/prev-1") {
    val out = Windows.dailyReturns(prices())
      .filter($"stock_ticker" === "AAPL").orderBy($"stock_date")
      .select("stock_return").collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty)
    assert(math.abs(out(1).get.asInstanceOf[Double] - 0.1) < 1e-12)
  }

  test("latestPerKey picks newest row per ticker") {
    val out = Windows.latestPerKey(prices(), Seq("stock_ticker"), Seq(col("stock_date")))
      .select("stock_ticker", "stock_close").as[(String, Double)].collect().toMap
    assert(out === Map("AAPL" -> 120.0, "MSFT" -> 400.0))
  }
}
