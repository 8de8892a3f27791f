package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def frontier(rows: Seq[(Long, Double, Int)], width: Double = 1.0) =
    Skyline.skyline2D(rows.toDF("id", "cost", "gain"), "cost", "gain",
        c => floor(c / width))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("dominated rows drop; frontier survives") {
    // (1.0, 10) dominates (2.0, 9) and (1.5, 10); (3.0, 20) survives (more gain)
    val got = frontier(Seq(
      (1L, 1.0, 10), (2L, 2.0, 9), (3L, 1.5, 10), (4L, 3.0, 20)))
    assert(got == Seq(1L, 4L))
  }

  test("exact ties on both coordinates survive together") {
    val got = frontier(Seq((1L, 1.0, 10), (2L, 1.0, 10), (3L, 5.0, 5)))
    assert(got == Seq(1L, 2L))
  }

  test("same cost, different gain: only the max-gain row survives") {
    val got = frontier(Seq((1L, 1.0, 10), (2L, 1.0, 7)))
    assert(got == Seq(1L))
  }

  test("equal gain at higher cost is dominated (strict-prefix, not <=)") {
    val got = frontier(Seq((1L, 1.0, 10), (2L, 2.0, 10)))
    assert(got == Seq(1L))
  }

  test("two-level scan matches the naive frontier regardless of bucket width") {
    val rows = (1L to 200L).map { i =>
      (i, (i * 37 % 50).toDouble + 0.5, (i * 53 % 40).toInt)
    }
    val naive = rows.filter { case (_, c, g) =>
      !rows.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).sorted
    for (w <- Seq(0.5, 7.0, 1000.0)) {  // many buckets, few, and just one
      assert(frontier(rows, w) == naive, s"width $w diverges from naive")
    }
  }
}
