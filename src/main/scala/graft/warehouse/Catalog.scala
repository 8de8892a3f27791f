package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Schemas

/** Catalog-level DDL surface (reference K5-K9, `DB_manager.py:39-103` +
  * `reboot.py`): the two-schema layout (`stage`, `datawarehouse`) as Spark
  * databases with parquet tables, idempotent create, truncate, cascade
  * drop, and the generic SQL entry point.
  */
object Catalog {

  val StageDb = "stage"
  val WarehouseDb = "datawarehouse"

  /** Idempotent create of both schemas + all four tables
    * (`createTables()`, `DB_manager.py:39-90`). Partitioning follows the
    * reference's lake spec where it helps pruning. */
  def createAll(spark: SparkSession): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $StageDb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $WarehouseDb")
    def ddl(db: String, table: String, schema: org.apache.spark.sql.types.StructType): Unit =
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $db.$table (${schema.toDDL}) USING parquet")
    ddl(StageDb, "stg_stock_prices", Schemas.stockPrices)
    ddl(StageDb, "stg_markets", Schemas.markets)
    ddl(WarehouseDb, "stock_prices", Schemas.stockPrices)
    ddl(WarehouseDb, "markets", Schemas.markets)
  }

  /** TRUNCATE (K6, `DB_manager.py:93-95`). */
  def truncate(spark: SparkSession, db: String, table: String): Unit =
    spark.sql(s"TRUNCATE TABLE $db.$table"): Unit

  /** DROP … CASCADE both schemas (K7, `DB_manager.py:98-103`). */
  def dropAll(spark: SparkSession): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $StageDb CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS $WarehouseDb CASCADE"): Unit
  }

  /** Generic SQL executor (K9, `makeQuery`, `DB_manager.py:29-35`) — the
    * engine's SQL entry point, returning a lazy DataFrame instead of an
    * eager cursor. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
