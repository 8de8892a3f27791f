package graft.core

import org.apache.spark.sql.types._

/** Declared schemas (SURVEY §1.2): the reference infers schema at extract
  * time (pandas from JSON) and pins it at load time (DDL); we invert —
  * declare up front, validate on read.
  */
object Schemas {

  /** Raw EOD-quotes API payload (reference `API_manager.py:119-127`,
    * fixture FIXTURES.md §A1). */
  val eodRaw: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("adjusted_close", DoubleType),
    StructField("volume", LongType)))

  /** Raw exchange-symbol-list payload (`API_manager.py:131-140`, §A2). */
  val marketRaw: StructType = StructType(Seq(
    StructField("Code", StringType),
    StructField("Name", StringType),
    StructField("Country", StringType),
    StructField("Exchange", StringType),
    StructField("Currency", StringType),
    StructField("Type", StringType),
    StructField("Isin", StringType)))

  /** Fact table (`DB_manager.py:43-55,66-78`). Volume widened to long for
    * the lake (SURVEY §1.2 note: INT overflows plausible at scale). */
  val stockPrices: StructType = StructType(Seq(
    StructField("stock_date", DateType),
    StructField("stock_open", DoubleType),
    StructField("stock_high", DoubleType),
    StructField("stock_low", DoubleType),
    StructField("stock_close", DoubleType),
    StructField("stock_volume", LongType),
    StructField("stock_ticker", StringType),
    StructField("stock_year", IntegerType),
    StructField("stock_month", IntegerType),
    StructField("stock_day", IntegerType),
    StructField("stock_key", StringType)))

  /** Dimension table (`DB_manager.py:56-63,79-86`). */
  val markets: StructType = StructType(Seq(
    StructField("market_stockid", StringType),
    StructField("market_companyname", StringType),
    StructField("market_country", StringType),
    StructField("market_exchange", StringType),
    StructField("market_currency", StringType),
    StructField("market_stockisin", StringType)))
}
