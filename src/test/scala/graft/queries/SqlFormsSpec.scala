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
}
