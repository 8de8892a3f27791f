package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuotesSourceSpec extends SparkSpec {

  private def read() =
    spark.read.format("graft-quotes").load(fixtures)

  test("reads every ticker file with the ticker attached") {
    val rows = read().collect()
    assert(rows.nonEmpty)
    val byTicker = rows.groupBy(_.getAs[String]("ticker")).view.mapValues(_.length).toMap
    assert(byTicker.keySet === Set("AAPL", "MSFT")) // EMPTY.json has no rows
    // parity with the per-ticker JsonDirSource path
    val viaEtl = new graft.etl.JsonDirSource(spark, fixtures)
      .eod("AAPL", "0000-01-01").count()
    assert(byTicker("AAPL").toLong === viaEtl)
  }

  test("ticker predicate prunes files before I/O (one partition)") {
    val df = read().filter(col("ticker") === "AAPL")
    assert(df.rdd.getNumPartitions === 1)
    assert(df.select("ticker").distinct().collect().map(_.getString(0)).toSeq === Seq("AAPL"))
    val two = read().filter(col("ticker").isin("AAPL", "MSFT"))
    assert(two.rdd.getNumPartitions === 2)
  }

  test("date predicate is pushed and rows are pruned at parse time") {
    val df = read().filter(col("ticker") === "AAPL" && col("date") >= "2024-06-05")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(date,2024-06-05)"), scan)
    val dates = df.select("date").collect().map(_.getString(0))
    assert(dates.nonEmpty && dates.forall(_ >= "2024-06-05"))
  }

  test("column pruning narrows the read schema") {
    val df = read().select("ticker", "close")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("struct<ticker:string,close:double>"), scan)
    assert(df.columns.toSeq === Seq("ticker", "close"))
  }

  test("residual-filter contract: source pruning never drops needed rows") {
    // the source reports all filters as residual, so Spark re-applies
    // them — a predicate the source ignores (volume) still works
    val df = read().filter(col("volume") > 0 && col("ticker") === "AAPL")
    assert(df.count() > 0)
    assert(df.select(min(col("volume"))).collect().head.getLong(0) > 0)
  }
}
