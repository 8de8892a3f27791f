package graft.ops

import graft.SparkSpec

class NgramIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick silver"),
    (3L, "qu"),                      // too short for any trigram
    (4L, "kciuq reversed letters")   // has all of "quick"'s letters, few grams
  ).toDF("doc_id", "text")

  test("trigramPostings: distinct grams, short docs excluded") {
    val g = NgramIndex.trigramPostings(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(!g.exists(_._1 == 3L))
    // doc 2 "quick silver": 10 distinct trigrams ("qui","uic","ick","ck ",
    // "k s"," si","sil","ilv","lve","ver")
    assert(g.count(_._1 == 2L) == 10)
    assert(g.contains((1L, "qui")) && g.contains((1L, "fox")))
  }

  test("substringSearch: candidates contain all matches; exact verify filters") {
    val rows = NgramIndex.substringSearch(docs, "doc_id", "text",
        Seq(1L -> "quick", 2L -> "silver fox", 3L -> "zzz"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == ((2L, 2L)))   // docs 1 and 2 match "quick"
    // "silver fox": doc 2 has sil/ilv/lve/ver but not "r f"/" fo"/"fox";
    // doc 1 has fox but not silver — no doc has ALL grams → 0 candidates
    assert(rows(2L) == ((0L, 0L)))
    assert(rows(3L) == ((0L, 0L)))   // gram absent entirely
  }

  test("a false-positive candidate (grams present, not contiguous) is verified away") {
    val d2 = Seq(
      (1L, "abcd xyz bcde"),   // has abc, bcd, cde... and "cd " / "d x"
      (2L, "abcde")            // true match
    ).toDF("doc_id", "text")
    // pattern "abcde" grams: abc, bcd, cde — doc 1 has abc, bcd (from
    // "abcd") and cde (from "bcde") but never the contiguous "abcde"
    val rows = NgramIndex.substringSearch(d2, "doc_id", "text",
        Seq(1L -> "abcde"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(rows == ((2L, 1L)), "candidates must exceed matches here")
  }
}
