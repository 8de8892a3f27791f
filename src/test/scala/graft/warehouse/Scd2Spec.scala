package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (String, String, Double)*) =
    rows.toSeq.toDF("k", "name", "price")

  test("lifecycle: init → change → idempotent re-merge → new key") {
    val h0 = Scd2.init(snap(("A", "Apple", 1.0), ("B", "Banana", 2.0)), "2024-01-01")
    assert(h0.count() === 2 && h0.filter(col("is_current")).count() === 2)

    // price change for A, B unchanged
    val h1 = Scd2.merge(h0, snap(("A", "Apple", 1.5), ("B", "Banana", 2.0)),
      "k", "2024-02-01")
    assert(h1.count() === 3)
    val aRows = h1.filter(col("k") === "A").orderBy(col("valid_from")).collect()
    assert(aRows.length === 2)
    assert(aRows(0).getAs[String]("valid_to") === "2024-02-01")
    assert(!aRows(0).getAs[Boolean]("is_current"))
    assert(aRows(1).getAs[Double]("price") === 1.5)
    assert(aRows(1).getAs[Boolean]("is_current"))

    // identical batch again: no-op
    val h2 = Scd2.merge(h1, snap(("A", "Apple", 1.5), ("B", "Banana", 2.0)),
      "k", "2024-03-01")
    assert(h2.count() === 3)

    // new key C
    val h3 = Scd2.merge(h2, snap(("C", "Cherry", 3.0)), "k", "2024-04-01")
    assert(h3.filter(col("k") === "C").count() === 1)
    assert(h3.count() === 4)

    // point-in-time views
    val jan = Scd2.asOf(h3, "2024-01-15").select("k", "price")
      .as[(String, Double)].collect().toMap
    assert(jan === Map("A" -> 1.0, "B" -> 2.0))
    val apr = Scd2.asOf(h3, "2024-04-02").select("k", "price")
      .as[(String, Double)].collect().toMap
    assert(apr === Map("A" -> 1.5, "B" -> 2.0, "C" -> 3.0))
  }
}
