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

  test("bigram stream is the adjacent-pair projection; <2-token docs absent") {
    val docs = Seq((1L, "a b c"), (2L, "x"), (3L, "p q")).toDF("doc_id", "text")
    val got = LangModel.bigramStream(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "b"), (1L, "b", "c"), (3L, "p", "q")))
  }

  test("interpolated bigram score matches the hand-computed mixture") {
    // train "a b a b c": bigrams (a,b)×2 (b,a) (b,c); unigrams a=2 b=2 c=1
    val train = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val (bi, counts, totals) = LangModel.bigramModel(train, "text")
    def cost(c12: Long, c1: Option[Long], cu2: Long): Long = {
      val ml = c1.fold(0.0)(c => 0.9 * (c12.toDouble / c))
      val p = ml + 0.1 * ((cu2 + 1).toDouble / (5 + 3 + 1))
      math.round(-(math.log(p) / math.log(2.0)) * 1e6)
    }
    val target = Seq((9L, "a b c"), (10L, "z a")).toDF("doc_id", "text")
    val got = LangModel.scoreBitsPerBigram(target, bi, counts, totals,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val d9 = math.round(
      (cost(2, Some(2), 2) + cost(1, Some(2), 1)).toDouble / 2)
    val d10 = cost(0, None, 2) // unseen w1 'z': pure backoff on 'a'
    assert(got === Map(9L -> ((2L, d9)), 10L -> ((1L, d10))))
    // a high-ML bigram is strictly cheaper than a backoff-only one
    assert(cost(2, Some(2), 2) < cost(0, None, 2))
  }
}
