package graft.ops

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], nodes: Seq[Long], iters: Int) =
    LabelProp.propagate(
        edges.toDF("src", "dst", "w"), nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles joined by a weak bridge form two communities") {
    // triangle A: 1-2-3 (w=5), triangle B: 4-5-6 (w=5), bridge 3-4 (w=1)
    val und = Seq(
      (1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 5L),
      (4L, 5L, 5L), (5L, 6L, 5L), (4L, 6L, 5L),
      (3L, 4L, 1L))
    val edges = und ++ und.map { case (a, b, w) => (b, a, w) }
    val got = run(edges, 1L to 6L, iters = 3)
    // each triangle converges to its min member label
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L))
  }

  test("isolated nodes keep their own label") {
    val got = run(Seq((1L, 2L, 3L), (2L, 1L, 3L)), Seq(1L, 2L, 9L), iters = 2)
    assert(got(9L) == 9L)
  }

  test("tie-break adopts the minimum label deterministically") {
    // node 3 sees labels 1 and 2 with equal weight → takes 1
    val got = run(Seq((3L, 1L, 2L), (3L, 2L, 2L),
        (1L, 3L, 2L), (2L, 3L, 2L)), Seq(1L, 2L, 3L), iters = 1)
    assert(got(3L) == 1L)
  }

  test("result is partition-order independent") {
    val und = Seq(
      (1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 5L),
      (4L, 5L, 5L), (5L, 6L, 5L), (4L, 6L, 5L), (3L, 4L, 1L))
    val edges = (und ++ und.map { case (a, b, w) => (b, a, w) })
    val a = LabelProp.propagate(
        edges.toDF("src", "dst", "w").repartition(7),
        (1L to 6L).toDF("node"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = LabelProp.propagate(
        edges.toDF("src", "dst", "w").coalesce(1),
        (1L to 6L).toDF("node"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
