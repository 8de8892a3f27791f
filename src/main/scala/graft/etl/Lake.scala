package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** "Bronce" lake layer (reference `API_manager.py:202-207`, layout
  * `main.py:33-37`): partitioned parquet append.
  *
  * Parity layout partitions stocks by `year/month/day/ticker`
  * (`API_manager.py:123`) — faithful, but at high ticker cardinality it
  * explodes into tiny files (SURVEY §7.4). [[writeStocksCompact]] is the
  * scale layout: partition directories by `year/month` only (readers still
  * prune by date), ticker becomes a sort key inside row groups so parquet
  * min/max row-group stats + dictionary filters take over ticker pruning.
  */
object Lake {

  val stockPartitions: Seq[String] =
    Seq("stock_year", "stock_month", "stock_day", "stock_ticker")

  def writeStocks(df: DataFrame, root: String): Unit =
    df.write.mode("append")
      .partitionBy(stockPartitions: _*)
      .parquet(s"$root/stocks")

  /** Scale layout: date-only directories, ticker-sorted row groups. */
  def writeStocksCompact(df: DataFrame, root: String): Unit =
    df.sortWithinPartitions("stock_ticker", "stock_date")
      .write.mode("append")
      .partitionBy("stock_year", "stock_month")
      .parquet(s"$root/stocks")

  def writeMarkets(df: DataFrame, root: String): Unit =
    df.write.mode("append")
      .partitionBy("market_exchange")
      .parquet(s"$root/markets")

  def readStocks(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/stocks")

  def readMarkets(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/markets")
}
