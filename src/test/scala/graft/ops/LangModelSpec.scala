package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def bits(ct: Long, n: Long, v: Long): Long =
    math.round(-(math.log((ct + 1).toDouble / (n + v + 1)) / math.log(2.0)) * 1e6)

  test("self-score matches hand-computed smoothed bits") {
    // corpus: "a a b" + "b c" -> N=5, V=3; counts a=2, b=2, c=1
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = LangModel.selfScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n, v) = (5L, 3L)
    val d1 = math.round((bits(2, n, v) + bits(2, n, v) + bits(2, n, v)).toDouble / 3)
    val d2 = math.round((bits(2, n, v) + bits(1, n, v)).toDouble / 2)
    assert(got === Map(1L -> ((3L, d1)), 2L -> ((2L, d2))))
  }

  test("OOV terms score the smoothing share against a foreign LM") {
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")   // N=3, V=2
    val (counts, totals) = LangModel.unigramCounts(train, "text")
    val target = Seq((9L, "a zz")).toDF("doc_id", "text")
    val got = LangModel.scoreBitsPerToken(target, counts, totals, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = math.round((bits(2, 3, 2) + bits(0, 3, 2)).toDouble / 2)
    assert(got.toSeq === Seq((9L, 2L, exp)))
    // the OOV token is strictly more surprising than any seen token
    assert(bits(0, 3, 2) > bits(2, 3, 2))
  }

  test("boilerplate scores low, rare-heavy scores high — the curation contract") {
    val docs = (1L to 50L).map(i => (i, "the quick brown fox")) ++
      Seq((99L, "zyx wvu tsr qpo"))
    val scored = LangModel.selfScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(99L) > scored(1L))
  }

  test("tokenless docs are absent; scores partition-order independent") {
    val docs = Seq((1L, "a b"), (2L, " "), (3L, "")).toDF("doc_id", "text")
    val got = LangModel.selfScore(docs, "doc_id", "text").collect()
    assert(got.map(_.getLong(0)).toSet === Set(1L))

    val big = (1L to 60L).map(i => (i, s"t${i % 9} t${(i + 2) % 9} u${i % 4}"))
      .toDF("doc_id", "text")
    val a = LangModel.selfScore(big.repartition(13), "doc_id", "text").collect().toSet[Row]
    val b = LangModel.selfScore(big.coalesce(1), "doc_id", "text").collect().toSet[Row]
    assert(a === b)
  }
}
