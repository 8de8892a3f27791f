package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Schemas

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("requireSchema passes conforming frames, rejects drift") {
    val ok = Seq(("AAPL", "Apple Inc", "USA", "NASDAQ", "USD", "US03"))
      .toDF("market_stockid", "market_companyname", "market_country",
        "market_exchange", "market_currency", "market_stockisin")
    Validate.requireSchema(ok, Schemas.markets)
    val bad = ok.withColumn("market_stockid", lit(7))
    val e = intercept[IllegalArgumentException](
      Validate.requireSchema(bad, Schemas.markets))
    assert(e.getMessage.contains("market_stockid"))
    val missing = ok.drop("market_currency")
    assert(intercept[IllegalArgumentException](
      Validate.requireSchema(missing, Schemas.markets))
      .getMessage.contains("missing column market_currency"))
  }

  test("violations: one pass, per-rule failure counts, nulls count as failures") {
    val df = Seq(
      (Some("2024-06-03/AAPL"), 10.0),
      (None, -5.0),
      (Some("bad key"), 200.0)
    ).toDF("stock_key", "stock_close")
    val r = Validate.violations(df, Seq(
      Validate.notNull("stock_key"),
      Validate.inRange("stock_close", 0.0, 100.0),
      Validate.matches("stock_key", "^\\d{4}-\\d{2}-\\d{2}/[A-Z]+$")
    )).collect().head
    assert(r.getAs[Long]("n_rows") === 3)
    assert(r.getAs[Long]("stock_key_not_null") === 1)
    assert(r.getAs[Long]("stock_close_in_range") === 2)
    assert(r.getAs[Long]("stock_key_format") === 2)
  }

  test("uniqueness check") {
    assert(Validate.unique(Seq(1, 2, 3).toDF("k"), "k"))
    assert(!Validate.unique(Seq(1, 2, 2).toDF("k"), "k"))
  }
}
