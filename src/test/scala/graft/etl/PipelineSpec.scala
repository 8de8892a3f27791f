package graft.etl

import graft.SparkSpec
import graft.queries.LastPrice

/** End-to-end replay of the reference's smoke scenario (`main.py:49-102`):
  * two tickers + one exchange through extract → transform → lake → stage →
  * SCD-0 warehouse → last-price query; run twice to prove idempotence
  * (SURVEY §5.2 item 2).
  */
class PipelineSpec extends SparkSpec {

  private def mkPipeline(): Pipeline = {
    val root = tmpDir("pipe")
    new Pipeline(spark, new JsonDirSource(spark, fixtures),
      s"$root/lake", s"$root/wh", s"$root/state.json")
  }

  test("full run: lake + warehouse populated, state advanced") {
    val p = mkPipeline()
    assert(p.runStock("AAPL") === 3)
    assert(p.runStock("MSFT") === 2)
    assert(p.runMarket("NASDAQ") === 2)
    assert(p.warehouseStocks().count() === 5)
    assert(p.warehouseMarkets().count() === 2)
    assert(p.state.watermark("Stock", "AAPL") === "2024-06-05")
    assert(p.state.watermark("Stock", "MSFT") === "2024-06-04")
    // lake partition layout (API_manager.py:123): hive dirs per y/m/d/ticker
    val lakeDf = Lake.readStocks(spark, p.lakeRoot)
    assert(lakeDf.count() === 5)
    assert(lakeDf.columns.contains("stock_year"))
  }

  test("incremental: advanced watermark short-circuits; no double insert") {
    val p = mkPipeline()
    p.runStock("AAPL")
    // second run: from-date beyond fixture data -> empty extract -> no-op
    assert(p.runStock("AAPL") === 0L)
    assert(p.warehouseStocks().count() === 3)
  }

  test("market extraction is FULL every run; its watermark is informational only") {
    // Pins the SURVEY §7.4 decision on the reference's latent state bug:
    // `__readState`'s Market branch re-reads a consumed file handle
    // (API_manager.py:88), so its market watermark ALWAYS falls to the
    // backfill sentinel — accidentally implementing main.py:23's stated
    // intent ("LA EXTRACCION DE LOS MERCADOS ES FULL"). We implement the
    // intent deliberately: state never filters the market extract, and the
    // SCD-0 merge absorbs the full replay.
    val p = mkPipeline()
    assert(p.runMarket("NASDAQ") === 2)
    val wmAfterFirst = p.state.watermark("Market", "NASDAQ")
    assert(wmAfterFirst !== StateStore.Sentinel) // advanced (informational)
    // watermark present, yet the next run still extracts the full set —
    // 0 inserted proves the rows were re-extracted and deduped, not skipped
    assert(p.runMarket("NASDAQ") === 0L)
    assert(p.warehouseMarkets().count() === 2)
  }

  test("replay after state reset is deduped by the anti-join (effectively-once)") {
    val p = mkPipeline()
    p.runStock("AAPL")
    p.state.reset()
    assert(p.runStock("AAPL") === 0L) // re-extracted, but 0 new keys
    assert(p.warehouseStocks().count() === 3)
  }

  test("crash-retry does not duplicate lake rows (dynamic partition overwrite)") {
    // simulate a crash between the lake write and the state advance: the
    // watermark is unchanged, so a retry re-extracts and re-writes the
    // SAME batch — the batch's (y/m/d/ticker) partitions are rewritten,
    // not appended, so the lake holds each row once (the lake-side half
    // of effectively-once; the warehouse half is the anti-join)
    val p = mkPipeline()
    p.runStock("AAPL")
    val once = Lake.readStocks(spark, p.lakeRoot).count()
    // the retry: same extraction + lake write, as a crashed run would redo
    val raw = new JsonDirSource(spark, fixtures).eod("AAPL", "1990-01-02")
    Lake.writeStocks(Transforms.transformStock(raw, "AAPL"), p.lakeRoot)
    assert(Lake.readStocks(spark, p.lakeRoot).count() === once,
      "retry duplicated lake rows")
  }

  test("empty source: no partial writes, no state movement (S5 guard)") {
    val p = mkPipeline()
    assert(p.runStock("EMPTY") === 0L)
    assert(p.state.watermark("Stock", "EMPTY") === StateStore.Sentinel)
    assert(!new java.io.File(p.stocksWarehousePath).exists())
  }

  test("last-price parity: golden row + global-max-date quirk") {
    val p = mkPipeline()
    p.runStock("AAPL"); p.runStock("MSFT"); p.runMarket("NASDAQ")
    val aapl = LastPrice.parity(p.warehouseStocks(), p.warehouseMarkets(), "AAPL").collect()
    assert(aapl.length === 1)
    val r = aapl.head
    assert(r.getString(0) === "05-06-2024") // dd-MM-yyyy (DB_manager.py:184)
    assert(r.getString(1) === "AAPL")
    assert(r.getString(2) === "Apple Inc")
    assert(r.getDouble(3) === 195.87)
    assert(r.getString(4) === "NASDAQ")
    assert(r.getString(5) === "US0378331005")
    // the quirk (SURVEY §2.5): MSFT didn't trade on the global max date ->
    // parity mode returns ZERO rows, improved mode returns its own latest
    assert(LastPrice.parity(p.warehouseStocks(), p.warehouseMarkets(), "MSFT").isEmpty)
    val ms = LastPrice.improved(p.warehouseStocks(), p.warehouseMarkets(), "MSFT").collect()
    assert(ms.length === 1 && ms.head.getString(0) === "04-06-2024")
  }

  test("spark.sql form with named parameter (F10: no string interpolation)") {
    val p = mkPipeline()
    p.runStock("AAPL"); p.runMarket("NASDAQ")
    p.warehouseStocks().createOrReplaceTempView("stock_prices")
    p.warehouseMarkets().createOrReplaceTempView("markets")
    val out = spark.sql(LastPrice.sqlText, Map("ticker" -> "AAPL")).collect()
    assert(out.length === 1 && out.head.getString(2) === "Apple Inc")
  }
}
