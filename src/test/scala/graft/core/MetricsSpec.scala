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

  test("concurrent named scopes attribute to the right names") {
    val m = Metrics.install(spark)
    val sf = "/root/testdata/sf0.001"
    def run(name: String, table: String): Thread = {
      val t = new Thread(() =>
        m.named(name) {
          spark.read.parquet(s"$sf/$table.parquet")
            .write.mode("overwrite").format("noop").save()
        })
      t.start(); t
    }
    // two actions racing on different threads under different scopes —
    // the round-1 single-current-scope scheme cross-attributed these
    val threads = Seq(run("scope_nation", "nation"), run("scope_region", "region"))
    threads.foreach(_.join(30000))
    val deadline = System.currentTimeMillis() + 10000
    while ((m("scope_nation").isEmpty || m("scope_region").isEmpty) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(m("scope_nation").isDefined && m("scope_region").isDefined, m.all.keySet)
    // nation (25 rows) and region (5 rows) are distinguishable by rowsOut
    assert(m("scope_nation").get.rowsOut === 25)
    assert(m("scope_region").get.rowsOut === 5)
  }

  test("failing scoped action returns promptly, not after the full deadline") {
    val m = Metrics.install(spark)
    val t0 = System.currentTimeMillis()
    intercept[RuntimeException] {
      m.named("boom")(throw new RuntimeException("driver-side failure"))
    }
    // no SQL execution was submitted: the wait must be the short grace
    // window, not the 5s hard deadline
    assert(System.currentTimeMillis() - t0 < 2500)
  }

  test("driver-only scoped action (no SQL execution) returns promptly") {
    val m = Metrics.install(spark)
    val t0 = System.currentTimeMillis()
    val r = m.named("pure")(21 * 2)
    assert(r === 42)
    assert(System.currentTimeMillis() - t0 < 2500)
  }

  test("reused scope name waits for the NEW snapshot, not the stale one") {
    val m = Metrics.install(spark)
    val sf = "/root/testdata/sf0.001"
    def load(table: String): Unit = m.named("reused") {
      spark.read.parquet(s"$sf/$table.parquet")
        .write.mode("overwrite").format("noop").save()
    }
    load("nation") // 25 rows
    load("region") // 5 rows — a stale-presence wait would still show 25
    assert(m("reused").get.rowsOut === 5)
  }
}
