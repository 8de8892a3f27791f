package graft.ops

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("hashedTf: collisions sum, empty tokens dropped, fixed width") {
    // dim=1: every term collides into bucket 0, so tf = token count
    val docs = Seq((1L, "a b b c"), (2L, "x"), (3L, " ")).toDF("id", "text")
    val one = Features.hashedTf(docs, "id", "text", dim = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one === Set((1L, 0L, 4L), (2L, 0L, 1L)),
      "all-collision bucket must sum token counts; blank doc emits nothing")
    // wide dim: per-doc tf total is conserved regardless of bucketing
    val wide = Features.hashedTf(docs, "id", "text", dim = 1024)
    val byDoc = wide.groupBy("doc_id").sum("tf").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byDoc === Map(1L -> 4L, 2L -> 1L))
    assert(wide.agg(org.apache.spark.sql.functions.max("bucket"))
      .head.getLong(0) < 1024L)
  }

  test("hashedTfIdf: smoothed idf exact, rarer bucket weighs more") {
    // 3 docs; with dim=1024 and these tokens no collisions occur, so
    // bucket df is term df: "a" in all 3 docs, "q" in 1
    val docs = Seq((1L, "a q"), (2L, "a"), (3L, "a")).toDF("id", "text")
    val got = Features.hashedTfIdf(docs, "id", "text", dim = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    def idfFp6(n: Long, df: Long): Long =
      math.round((math.log((n + 1.0) / (df + 1.0)) + 1.0) * 1e6)
    val idfs = got.map(_._2).toSet
    assert(idfs === Set(idfFp6(3, 3), idfFp6(3, 1)),
      "exactly the two expected smoothed-idf fixed-point values")
    assert(idfFp6(3, 1) > idfFp6(3, 3), "rarer bucket must weigh more")
    // tfidf = tf * idf_fp6 exactly (tf=1 everywhere here)
    assert(got.forall { case (_, idf, tfidf) => tfidf == idf })
    // determinism under repartition
    val again = Features.hashedTfIdf(docs.repartition(5), "id", "text", 1024)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq ===
      again.sortBy(t => (t._1, t._2)).toSeq)
  }
}
