package graft.core

import graft.SparkSpec
import graft.core.Models._

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("typed datasets round-trip the corpus schemas") {
    val ev = Models.events(spark, sf)
    assert(ev.head().event_id >= 0)
    val docs = Models.documents(spark, sf)
    assert(docs.head().text.nonEmpty)
    val emb = Models.embeddings(spark, sf)
    assert(emb.head().embedding.length === 64)
  }

  test("typed groupByKey aggregation compiles and computes") {
    val perType = Models.events(spark, sf)
      .groupByKey(_.event_type)
      .mapGroups((k, it) => (k, it.length))
      .collect().toMap
    assert(perType.values.sum === 1000)
    assert(perType.keySet.contains("purchase"))
  }

  test("warehouse stocks can be viewed as Dataset[StockPrice]") {
    val raw = Seq(("2024-06-03", 1.0, 2.0, 0.5, 1.5, 1.4, 100L))
      .toDF("date", "open", "high", "low", "close", "adjusted_close", "volume")
    val typed = graft.etl.Transforms.transformStock(raw, "AAPL")
      .withColumn("stock_volume", org.apache.spark.sql.functions.col("stock_volume").cast("long"))
      .as[StockPrice]
    val r = typed.head()
    assert(r.stock_key === "2024-06-03/AAPL" && r.stock_year === 2024)
  }
}
