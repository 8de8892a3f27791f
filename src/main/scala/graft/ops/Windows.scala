package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed feature derivation. The reference's rename map carries
  * `mean-30days` → `stock_30daymean` and `dif_mean` → `stock_dif_mean`
  * (`API_manager.py:180-181`) but nothing computes them — dead config
  * (SURVEY §2.4). Here they are real derived features over the warehouse
  * fact table, plus the generic latest-per-key and lag-return helpers.
  */
object Windows {

  /** 30-row rolling close mean + deviation per ticker (frame
    * `rowsBetween(-29, 0)` ordered by trade date). */
  def stockRollingFeatures(prices: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("stock_ticker"))
      .orderBy(col("stock_date")).rowsBetween(-29, 0)
    prices
      .withColumn("stock_30daymean", avg(col("stock_close")).over(w))
      .withColumn("stock_dif_mean", col("stock_close") - col("stock_30daymean"))
  }

  /** Day-over-day simple return per ticker. */
  def dailyReturns(prices: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("stock_ticker")).orderBy(col("stock_date"))
    val prev = lag(col("stock_close"), 1).over(w)
    prices.withColumn("stock_return",
      when(prev.isNotNull && prev =!= 0.0, col("stock_close") / prev - 1.0))
  }

  /** Generic latest-row-per-key (the improved-mode E3 primitive). */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
