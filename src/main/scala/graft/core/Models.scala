package graft.core

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row models: `Dataset[T]` views for the pipelines where compile-time
  * field checks help (ETL transforms, streaming state logic). Schemas match
  * [[Schemas]] / the corpus parquet footers; the untyped `DataFrame` API
  * remains the dynamic-schema path.
  */
object Models {

  final case class StockPrice(
      stock_date: Date, stock_open: Double, stock_high: Double,
      stock_low: Double, stock_close: Double, stock_volume: Long,
      stock_ticker: String, stock_year: Int, stock_month: Int,
      stock_day: Int, stock_key: String)

  final case class Market(
      market_stockid: String, market_companyname: String,
      market_country: String, market_exchange: String,
      market_currency: String, market_stockisin: String)

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Double, props: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }
}
