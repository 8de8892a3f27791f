package graft.ops

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Triangles.nodeTriangles(edges.toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("K4: every node in 3 triangles, clustering 1.0") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = run(k4)
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    got.values.foreach { case (deg, tri, c) =>
      assert(deg === 3L); assert(tri === 3L); assert(c === 1000000L)
    }
  }

  test("triangle-free path: zero triangles, degree-1 endpoints excluded") {
    val got = run(Seq((1L, 2L), (2L, 3L)))
    assert(got === Map(2L -> ((2L, 0L, 0L))))
  }

  test("hub with one rim edge: the orientation charges the wedge to the rim") {
    // star h=0 → {1..5} plus rim edge (1,2): exactly one triangle (0,1,2)
    val star = (1L to 5L).map(r => (0L, r)) :+ (1L, 2L)
    val got = run(star)
    assert(got(0L) === ((5L, 1L, 100000L)))  // 2/(5·4) = 0.1
    assert(got(1L) === ((2L, 1L, 1000000L)))
    assert(got(2L) === ((2L, 1L, 1000000L)))
    assert(!got.contains(3L))                // degree 1: undefined, excluded
  }

  test("two triangles sharing an edge") {
    // (1,2,3) and (2,3,4): shared edge (2,3)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = run(g)
    assert(got(1L)._2 === 1L && got(4L)._2 === 1L)
    assert(got(2L)._2 === 2L && got(3L)._2 === 2L)
    // deg(2)=3, tri=2 → 2·2/(3·2) = 2/3
    assert(got(2L)._3 === 666667L)
  }
}
