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

  /** Compaction: rewrite a partitioned dataset to one file per partition
    * directory (hash-repartition on the partition columns puts each
    * directory's rows in a single task). The parity layout
    * (`year/month/day/ticker`) accretes one small file per incremental
    * append (SURVEY §7.4's small-files risk); periodic compaction restores
    * scan efficiency without changing the directory contract. Writes to a
    * temp sibling then swaps, so readers never see a half-compacted tree. */
  def compact(spark: SparkSession, dir: String, partitionCols: Seq[String]): Unit = {
    import graft.core.Fs
    val bak = dir + ".old"
    // crash recovery: a previous compact that died between its two renames
    // left the data parked at `.old` with no live dir — restore it first
    if (!Fs.exists(spark, dir) && Fs.exists(spark, bak))
      Fs.renameOverwrite(spark, bak, dir)
    val df = spark.read.parquet(dir)
    val tmp = dir + ".compacting"
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmp)
    // swap through the Hadoop FS API (works on HDFS/S3A/local alike).
    // Readers never see a half-compacted MIX, but there IS a brief window
    // between the two renames where `dir` is absent (and on S3A, where
    // rename is copy+delete, the window is proportional to table size) —
    // concurrent readers must retry, and a crash inside the window is
    // healed by the recovery above. True atomic publish needs a metadata
    // pointer (table format / metastore), out of scope for a lake dir.
    Fs.delete(spark, bak)
    Fs.renameOverwrite(spark, dir, bak)
    Fs.renameOverwrite(spark, tmp, dir)
    Fs.delete(spark, bak)
  }

  def readMarkets(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/markets")
}
