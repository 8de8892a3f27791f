package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def cov(docs: Seq[(Long, String)], span: Int) =
    SpanDedup.dupSpanCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", span)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("a planted cross-doc span is covered exactly; unique text is not") {
    // docs 1 and 2 share the 3-token window "x y z" at different offsets;
    // doc 3 is fully unique
    val got = cov(Seq(
      (1L, "a b x y z c"),
      (2L, "x y z q r s"),
      (3L, "k l m n o p")), span = 3)
    // doc 1: positions 3..5 covered; doc 2: positions 1..3
    assert(got(1L) === ((6L, 3L, 0.5)))
    assert(got(2L) === ((6L, 3L, 0.5)))
    assert(got(3L) === ((6L, 0L, 0.0)))
  }

  test("overlapping duplicated windows union their coverage, not double-count") {
    // "w w w w" in both docs: windows at pos 1..2 overlap; coverage is
    // the union {1..4}, and the repeat inside ONE doc also counts
    val got = cov(Seq((1L, "w w w w a"), (2L, "w w w w b")), span = 3)
    assert(got(1L)._2 === 4L)
    assert(got(2L)._2 === 4L)
  }

  test("an intra-doc repeat is duplicated even with no second document") {
    val got = cov(Seq((1L, "p q r s p q r t")), span = 3)
    // "p q r" at pos 1 and 5 -> covered {1,2,3,5,6,7}
    assert(got(1L) === ((8L, 6L, 0.75)))
  }

  test("docs shorter than the span window score zero but still appear") {
    val got = cov(Seq((1L, "a b"), (2L, "a b"), (3L, "")), span = 3)
    assert(got === Map(1L -> ((2L, 0L, 0.0)), 2L -> ((2L, 0L, 0.0))))
  }

  test("coverage is partition-order independent") {
    val docs = (1L to 30L).map(i => (i, s"c0 c1 c2 c3 u${i}a u${i}b u${i}c"))
    val df = docs.toDF("doc_id", "text")
    val a = SpanDedup.dupSpanCoverage(df.repartition(9), "doc_id", "text", 4)
      .collect().toSet[Row]
    val b = SpanDedup.dupSpanCoverage(df.coalesce(1), "doc_id", "text", 4)
      .collect().toSet[Row]
    assert(a === b)
    // the shared 4-token prefix is duplicated across all docs
    assert(a.forall(r => r.getLong(2) === 4L))
  }
}
