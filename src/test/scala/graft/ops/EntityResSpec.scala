package graft.ops

import graft.SparkSpec

class EntityResSpec extends SparkSpec {
  import spark.implicits._

  test("nameSimilarity is 1 - lev/maxlen in fixed point") {
    val df = Seq(("cold widget", "bold widget")).toDF("a", "b")
    val sim = df.select(EntityRes.nameSimilarity($"a", $"b")).head().getDouble(0)
    // lev = 1, maxlen = 11
    assert(sim == 1.0 - 1.0 / 11)
  }

  test("blockedMatches pairs only within blocks, thresholded, id_a < id_b") {
    val recs = Seq(
      (1L, "cold widget", "B1"),
      (2L, "bold widget", "B1"),   // lev 1 vs id 1 → sim 10/11 ≈ .909
      (3L, "cold widget", "B2"),   // same name, different block: no pair
      (4L, "zzzzzzzzzzz", "B1"),   // lev 10..11 vs others → below threshold
      (5L, "cold widget", "B1")    // exact dup of id 1 → sim 1.0
    ).toDF("id", "name", "blk")
    val got = EntityRes.blockedMatches(recs, "id", "name", Seq("blk"), 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq(
      (1L, 2L, 909091L),  // round(10/11 * 1e6)
      (1L, 5L, 1000000L),
      (2L, 5L, 909091L)))
  }

  test("threshold is applied to the fixed-point score (no float boundary)") {
    // sim exactly 0.6: lev 4 over len 10 → 600000 → kept at minSim 0.6
    val recs = Seq((1L, "aaaaaaaaaa", "B"), (2L, "aaaaaabbbb", "B"))
      .toDF("id", "name", "blk")
    val got = EntityRes.blockedMatches(recs, "id", "name", Seq("blk"), 0.6).collect()
    assert(got.length == 1 && got.head.getLong(2) == 600000L)
  }
}
