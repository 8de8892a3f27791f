package graft.warehouse

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("create/truncate/drop lifecycle is idempotent (K5-K7)") {
    Catalog.dropAll(spark)
    Catalog.createAll(spark)
    Catalog.createAll(spark) // idempotent re-create
    assert(spark.catalog.tableExists("stage.stg_stock_prices"))
    assert(spark.catalog.tableExists("datawarehouse.markets"))

    spark.sql(
      """INSERT INTO stage.stg_markets VALUES
        |('AAPL', 'Apple Inc', 'USA', 'NASDAQ', 'USD', 'US0378331005')""".stripMargin)
    assert(spark.table("stage.stg_markets").count() === 1)

    Catalog.truncate(spark, "stage", "stg_markets")
    assert(spark.table("stage.stg_markets").count() === 0)

    Catalog.dropAll(spark)
    assert(!spark.catalog.databaseExists("stage"))
  }

  test("generic SQL entry point returns lazy DataFrames (K9)") {
    val df = Catalog.sql(spark, "SELECT 1 AS one")
    assert(df.collect().head.getInt(0) === 1)
  }
}
