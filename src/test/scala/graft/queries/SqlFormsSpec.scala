package graft.queries

import graft.SparkSpec
import graft.core.Tables

/** K9 surface check: the declared semantics are reachable through plain
  * `spark.sql` too — Spark-dialect texts produce identical results to the
  * DataFrame forms (same engine, same Catalyst plans modulo parse path).
  */
class SqlFormsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def register(): Unit =
    Tables.all.foreach(t =>
      Tables(spark, sf, t).createOrReplaceTempView(t))

  private def same(df: org.apache.spark.sql.DataFrame, sql: String): Unit = {
    register()
    val viaSql = spark.sql(sql)
    assert(viaSql.columns.toSeq === df.columns.toSeq)
    assert(viaSql.exceptAll(df).isEmpty && df.exceptAll(viaSql).isEmpty)
  }

  test("q1 via spark.sql equals the DataFrame form") {
    same(Relational.q1Agg(spark, sf),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("q4 via spark.sql (scalar subquery + left join) equals DataFrame form") {
    same(Relational.q4LatestGlobal(spark, sf),
      """SELECT date_format(o_orderdate, 'dd-MM-yyyy') AS order_date,
        |  o_orderkey, o_custkey, c_name, o_totalprice, o_orderstatus
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  test("q5 via spark.sql (NOT EXISTS) equals DataFrame anti-join form") {
    same(Relational.q5AntiJoin(spark, sf),
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)
  }

  private def registerPriceViews(): Unit = {
    import spark.implicits._
    Seq(
      ("AAPL-1", "AAPL", java.sql.Date.valueOf("2024-01-02"), 185.5),
      ("AAPL-2", "AAPL", java.sql.Date.valueOf("2024-01-03"), 186.1),
      ("MSFT-1", "MSFT", java.sql.Date.valueOf("2024-01-02"), 370.0)
    ).toDF("stock_key", "stock_ticker", "stock_date", "stock_close")
      .createOrReplaceTempView("stock_prices")
    Seq(
      ("AAPL", "Apple Inc", "NASDAQ", "US0378331005"),
      ("MSFT", "Microsoft", "NASDAQ", "US5949181045")
    ).toDF("market_stockid", "market_companyname", "market_exchange", "market_stockisin")
      .createOrReplaceTempView("markets")
  }

  test("F10: named-param execution equals the DataFrame parity form (golden row)") {
    registerPriceViews()
    val viaParam = LastPrice.sqlParity(spark, "AAPL")
    val viaDf = LastPrice.parity(
      spark.table("stock_prices"), spark.table("markets"), "AAPL")
    assert(viaParam.columns.toSeq === viaDf.columns.toSeq)
    assert(viaParam.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaParam).isEmpty)
    val row = viaParam.collect().toSeq
    assert(row.map(_.getString(0)) === Seq("03-01-2024")) // global max date
    assert(row.map(_.getDouble(3)) === Seq(186.1))
    // reference quirk preserved: MSFT didn't trade on the global max date
    assert(LastPrice.sqlParity(spark, "MSFT").isEmpty)
  }

  test("F10: a hostile ticker value stays a literal — no injection") {
    registerPriceViews()
    // under the reference's f-string this input rewrites the predicate to
    // TRUE and leaks every row; under named binding it's just a non-match
    val hostile = LastPrice.sqlParity(spark, "AAPL' OR '1'='1")
    assert(hostile.isEmpty)
  }
}
