package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's one analytical query (E3, `DB_manager.py:181-199`):
  * latest close for a ticker, fact LEFT-joined to dimension, date formatted
  * `dd-MM-yyyy` (`TO_CHAR`, line 184).
  *
  * Two modes (SURVEY §2.5):
  *  - [[parity]] keeps the reference quirk — the scalar subquery takes the
  *    *global* max date, so a ticker that didn't trade that day returns
  *    zero rows;
  *  - [[improved]] answers per-ticker latest via a window.
  *
  * The ticker predicate is a `lit` parameter, not string interpolation —
  * the reference f-strings it into SQL (`DB_manager.py:196`, injection-
  * prone; SURVEY F10 says parameterize).
  */
object LastPrice {

  private val outCols = Seq(
    date_format(col("stock_date"), "dd-MM-yyyy").as("price_date"),
    col("stock_ticker"), col("market_companyname"), col("stock_close"),
    col("market_exchange"), col("market_stockisin"))

  def parity(prices: DataFrame, markets: DataFrame, ticker: String): DataFrame = {
    val maxD = prices.agg(max(col("stock_date")).as("stock_date"))
    prices
      .join(broadcast(maxD), Seq("stock_date")) // scalar subquery, kept lazy
      .filter(col("stock_ticker") === lit(ticker))
      .join(broadcast(markets), col("stock_ticker") === col("market_stockid"), "left")
      .select(outCols: _*)
  }

  def improved(prices: DataFrame, markets: DataFrame, ticker: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("stock_ticker"))
      .orderBy(col("stock_date").desc)
    prices
      .filter(col("stock_ticker") === lit(ticker)) // pushed below the window
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .join(broadcast(markets), col("stock_ticker") === col("market_stockid"), "left")
      .select(outCols: _*)
  }

  /** Execute [[sqlText]] with the ticker BOUND as a named parameter —
    * Spark substitutes it as a typed literal during parsing, so the value
    * can never terminate the string and rewrite the query. This is the fix
    * SURVEY F10 demands for the reference's injection-prone f-string
    * (`DB_manager.py:196`: `f"... S.ticker = '{ticker}'"`). Requires
    * `stock_prices` / `markets` registered (temp view or catalog). */
  def sqlParity(spark: SparkSession, ticker: String): DataFrame =
    spark.sql(sqlText, Map("ticker" -> ticker))

  /** The SQL form, verbatim shape of `DB_manager.py:182-196`, for
    * [[sqlParity]] once `stock_prices`/`markets` are registered. */
  def sqlText: String =
    """SELECT date_format(S.stock_date, 'dd-MM-yyyy') AS price_date,
      |  S.stock_ticker, M.market_companyname, S.stock_close,
      |  M.market_exchange, M.market_stockisin
      |FROM stock_prices S
      |LEFT JOIN markets M ON S.stock_ticker = M.market_stockid
      |WHERE S.stock_date = (SELECT MAX(stock_date) FROM stock_prices)
      |  AND S.stock_ticker = :ticker""".stripMargin
}
