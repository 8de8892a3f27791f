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

  test("removeDupSpans strips exactly the covered positions, rebuilds the rest") {
    val got = SpanDedup.removeDupSpans(Seq(
      (1L, "a b x y z c"),
      (2L, "x y z q r s"),
      (3L, "k l m n o p")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // "x y z" duplicated: doc 1 loses positions 3..5, doc 2 loses 1..3
    assert(got(1L) === (("a b c", 6L, 3L)))
    assert(got(2L) === (("q r s", 6L, 3L)))
    assert(got(3L) === (("k l m n o p", 6L, 0L)))
  }

  test("removeDupSpans: fully duplicated doc becomes empty, short docs survive") {
    val got = SpanDedup.removeDupSpans(Seq(
      (1L, "w w w"), (2L, "w w w"), (3L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("", 3L, 3L)))
    assert(got(2L) === (("", 3L, 3L)))
    assert(got(3L) === (("a b", 2L, 0L)))
    // removal is consistent with the coverage measure
    val cov = SpanDedup.dupSpanCoverage(Seq(
      (1L, "w w w"), (2L, "w w w"), (3L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cov(1L) === 3L && cov(3L) === 0L)
  }

  test("span-keys kernel: identical windows identical keys, distinct differ, shape") {
    import graft.functions.SpanKeysUtil
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def keys(toks: Seq[String], span: Int): Seq[Long] = {
      val a = SpanKeysUtil.compute(
        new GenericArrayData(toks.map(t =>
          if (t == null) null else UTF8String.fromString(t)).toArray[Any]), span)
      (0 until a.numElements()).map(a.getLong)
    }
    // length = n - span + 1; empty when too short
    assert(keys(Seq("a", "b", "c", "d"), 2).length === 3)
    assert(keys(Seq("a"), 2).isEmpty)
    // the same window at different offsets and in different docs gets the
    // SAME key (the rolling recurrence must equal the direct fold)
    val k1 = keys(Seq("p", "q", "r", "s", "p", "q", "r", "t"), 3)
    assert(k1(0) === k1(4), "identical windows must collide")
    assert(keys(Seq("x", "p", "q", "r"), 3)(1) === k1(0),
      "rolled and initial window keys must agree")
    // distinct windows get distinct keys; token boundaries matter
    assert(k1.distinct.length === k1.length - 1)
    assert(keys(Seq("ab", "c"), 2).head !== keys(Seq("a", "bc"), 2).head)
    // null tokens hash as empty strings, never null keys
    assert(keys(Seq(null, "a", null), 2).length === 2)
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
