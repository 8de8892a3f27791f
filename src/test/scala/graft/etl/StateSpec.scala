package graft.etl

import graft.SparkSpec

class StateSpec extends SparkSpec {

  test("missing key returns the full-backfill sentinel") {
    val st = new StateStore(spark, tmpDir("state") + "/state.json")
    assert(st.watermark("Stock", "AAPL") === StateStore.Sentinel)
  }

  test("advance persists and is monotone (never moves backward)") {
    val st = new StateStore(spark, tmpDir("state") + "/state.json")
    st.advance("Stock", "AAPL", "2024-06-03")
    assert(st.watermark("Stock", "AAPL") === "2024-06-03")
    st.advance("Stock", "AAPL", "2024-06-01") // stale update: ignored
    assert(st.watermark("Stock", "AAPL") === "2024-06-03")
    st.advance("Stock", "AAPL", "2024-06-05")
    assert(st.watermark("Stock", "AAPL") === "2024-06-05")
  }

  test("kinds are independent; reset restores the sentinel") {
    val st = new StateStore(spark, tmpDir("state") + "/state.json")
    st.advance("Stock", "AAPL", "2024-06-03")
    st.advance("Market", "NASDAQ", "2024-06-04")
    assert(st.watermark("Market", "NASDAQ") === "2024-06-04")
    assert(st.watermark("Market", "AAPL") === StateStore.Sentinel)
    st.reset()
    assert(st.watermark("Stock", "AAPL") === StateStore.Sentinel)
  }
}
