package graft.core

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  test("listener captures scan metrics for a named action") {
    val m = Metrics.install(spark)
    m.named("lineitem_count") {
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
    }
    // listener delivery is async; poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (m("lineitem_count").isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    val snap = m("lineitem_count")
    assert(snap.isDefined, s"captured: ${m.all.keySet}")
    assert(snap.get.filesRead >= 1)
    assert(snap.get.bytesRead > 0)
    assert(snap.get.durationMs >= 0)
  }
}
