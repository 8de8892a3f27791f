package graft.functions

import graft.SparkSpec

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed minhash aggregator: identical shingle sets → identical sigs") {
    val shingles = Seq(
      (1L, "a b c"), (1L, "b c d"), (1L, "c d e"),
      (2L, "c d e"), (2L, "a b c"), (2L, "b c d"), // same set, different order
      (3L, "x y z"))
      .toDF("doc_id", "sh").as[(Long, String)]
    val sigs = shingles.groupByKey(_._1).mapValues(_._2)
      .agg(MinHashAgg(16).toColumn.name("sig"))
      .collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    assert(sigs(1L).length === 16)
  }

  test("partial signatures merge: repartitioned input gives the same result") {
    val base = (0 until 200).map(i => (1L, s"sh-${i % 50}"))
    val one = base.toDF("doc_id", "sh").as[(Long, String)].coalesce(1)
      .groupByKey(_._1).mapValues(_._2)
      .agg(MinHashAgg(8).toColumn.name("sig")).collect().toMap
    val many = base.toDF("doc_id", "sh").as[(Long, String)].repartition(16)
      .groupByKey(_._1).mapValues(_._2)
      .agg(MinHashAgg(8).toColumn.name("sig")).collect().toMap
    assert(one(1L) === many(1L))
  }
}
