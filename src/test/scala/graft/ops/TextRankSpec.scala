package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  // 4-doc corpus with hand-countable stats: "rare" appears in one doc,
  // "common" in all four; doc 4 is long (length normalization target)
  private def corpus() = Seq(
    (1L, "common rare alpha"),
    (2L, "common alpha alpha"),
    (3L, "common beta"),
    (4L, "common common common common common common common alpha")
  ).toDF("doc_id", "text")

  private def score(tf: Long, df: Long, lenD: Long, nDocs: Long, totLen: Long): Long = {
    val avgdl = totLen.toDouble / nDocs
    val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    val tfn = (tf * 2.2) / (tf + TextRank.K1 * ((1.0 - TextRank.B) + TextRank.B * (lenD / avgdl)))
    math.round(idf * tfn * 1e6)
  }

  test("bm25TopK matches hand-computed fixed-point scores") {
    val got = TextRank.bm25TopK(corpus(), Seq(1L -> Seq("rare", "common")),
        "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    // n_docs=4, tot_len=16; df(rare)=1, df(common)=4
    val s1 = score(1, 1, 3, 4, 16) + score(1, 4, 3, 4, 16)   // doc 1: rare + common
    val s2 = score(1, 4, 3, 4, 16)                           // doc 2: common only
    val s3 = score(1, 4, 2, 4, 16)                           // doc 3: common only, shorter
    val s4 = score(7, 4, 8, 4, 16)                           // doc 4: saturated common
    val byDoc = got.map(t => t._3 -> t._4).toMap
    assert(byDoc === Map(1L -> s1, 2L -> s2, 3L -> s3, 4L -> s4))

    // doc 1 wins on idf spread: the rare term dominates saturated tf
    assert(got.head._3 === 1L && got.head._2 === 1L)
  }

  test("posting index: batched appends serve scores identical to the " +
      "direct corpus scorer; replayed appends are exactly-once") {
    import org.apache.spark.sql.functions.col
    val c = corpus()
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25idx_spec")
      .toString + "/idx"
    val qs = Seq(1L -> Seq("rare", "common"), 2L -> Seq("alpha", "beta"))
    // append-vs-rebuild parity: two batch appends == one-shot posting rows
    TextRank.appendToPostingIndex(c.filter(col("doc_id") <= 2), "doc_id",
      "text", tmp, batchId = 0L)
    TextRank.appendToPostingIndex(c.filter(col("doc_id") > 2), "doc_id",
      "text", tmp, batchId = 1L)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2), r.getLong(3))).sorted.toSeq
    val idx = rows(TextRank.readPostingIndex(spark, tmp))
    // the only difference vs a one-shot build: per-batch stats sentinels
    // (two rows summing to the corpus row) — posting rows identical
    val oneShot = rows(TextRank.postingRows(c, "doc_id", "text"))
    assert(idx.filter(_._1.isDefined) === oneShot.filter(_._1.isDefined))
    val sent = idx.filter(_._1.isEmpty)
    val sentOne = oneShot.filter(_._1.isEmpty)
    assert(sent.map(_._2).sum === sentOne.map(_._2).sum) // n_docs
    assert(sent.map(_._3).sum === sentOne.map(_._3).sum) // tot_len
    // exactly-once: replaying a committed batch changes nothing
    TextRank.appendToPostingIndex(c.filter(col("doc_id") <= 2), "doc_id",
      "text", tmp, batchId = 0L)
    assert(rows(TextRank.readPostingIndex(spark, tmp)) === idx)
    // served scores == direct scorer, to the fixed-point bit
    val direct = TextRank.bm25TopK(c, qs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val served = TextRank.bm25TopKIndexed(
        TextRank.readPostingIndex(spark, tmp), qs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(served === direct)
    assert(served.nonEmpty)
  }

  test("rare-term idf outweighs common-term tf saturation") {
    // doc 4 has 7x the common tf of doc 1 but never outranks doc 1's
    // single rare hit — the property that distinguishes BM25 from tf
    val got = TextRank.bm25TopK(corpus(), Seq(1L -> Seq("rare", "common")),
      "doc_id", "text", k = 2).collect()
    val ranked = got.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    assert(ranked.head === 1L)
    assert(got.length === 2)  // k honored
  }

  test("non-matching docs never appear; ties break by doc_id") {
    val df = Seq(
      (10L, "x y"), (11L, "x y"), (12L, "z z")
    ).toDF("doc_id", "text")
    val got = TextRank.bm25TopK(df, Seq(7L -> Seq("x")), "doc_id", "text", k = 10)
      .collect().sortBy(_.getLong(1))
    assert(got.map(_.getLong(2)).toSeq === Seq(10L, 11L))  // 12 absent, tie by id
    assert(got.map(_.getLong(3)).distinct.length === 1)    // identical scores
  }

  test("scores are partition-order independent") {
    val base = corpus()
    val a = TextRank.bm25TopK(base.repartition(7), Seq(1L -> Seq("rare", "common", "alpha")),
      "doc_id", "text", k = 10).collect().toSet[Row]
    val b = TextRank.bm25TopK(base.coalesce(1), Seq(1L -> Seq("rare", "common", "alpha")),
      "doc_id", "text", k = 10).collect().toSet[Row]
    assert(a === b)
  }

  // ---- textRankKeywords ----

  /** Reference fixed-point PageRank over explicit undirected weighted
    * edges, mirroring the operator's rounding discipline exactly. */
  private def refTextRank(und: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val directed = und.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
    val wsrc = directed.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = wsrc.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = directed
        .map { case (u, v, w) => v -> math.round(r(u).toDouble * w / wsrc(u)) }
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      r = in.map { case (v, s) => v -> (150000L + math.round(TextRank.Damping * s)) }
    }
    r
  }

  test("textRankKeywords matches a reference fixed-point PageRank") {
    // docs: "a b", "b c", "b c" -> path graph a-b (w=1), b-c (w=2)
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "b c")).toDF("doc_id", "text")
    val got = TextRank.textRankKeywords(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = refTextRank(Seq(("a", "b", 1L), ("b", "c", 2L)), 5)
    assert(got.map(t => t._2 -> t._3).toMap === exp)
    // b is the hub: strictly top-ranked
    assert(got.find(_._1 == 1L).map(_._2).contains("b"))
  }

  test("hub term outranks leaves in a star graph; self-loops ignored") {
    // star around "hub"; "z z" contributes only a self-loop (dropped),
    // so z never becomes a node
    val docs = Seq(
      (1L, "hub x"), (2L, "hub y"), (3L, "hub w"), (4L, "z z")
    ).toDF("doc_id", "text")
    val got = TextRank.textRankKeywords(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.head._2 === "hub")
    assert(!got.map(_._2).contains("z"))
    assert(got.length === 4)
  }

  test("one-token docs join the graph only via adjacency elsewhere") {
    val docs = Seq((1L, "lonely"), (2L, "a b")).toDF("doc_id", "text")
    val terms = TextRank.textRankKeywords(docs, "doc_id", "text", k = 10)
      .collect().map(_.getString(1)).toSet
    assert(terms === Set("a", "b"))
  }

  test("keyword ranks are partition-order independent and k-limited") {
    val docs = (1L to 40L).map(i =>
      (i, s"t${i % 7} t${(i + 1) % 7} t${(i + 3) % 7}")).toDF("doc_id", "text")
    val a = TextRank.textRankKeywords(docs.repartition(11), "doc_id", "text", k = 3)
      .collect().toSet[Row]
    val b = TextRank.textRankKeywords(docs.coalesce(1), "doc_id", "text", k = 3)
      .collect().toSet[Row]
    assert(a === b && a.size === 3)
  }

  test("ndcgAtK: hand-computed DCG/IDCG on a 2-doc ranking") {
    import spark.implicits._
    // rel(q1): doc1 = common(1) + rare(1) = 2; doc2..3 = 1; doc4 = min(7,4)=4
    val got = TextRank.ndcgAtK(corpus(), Seq(1L -> Seq("rare", "common")),
        "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 1)
    val disc = TextRank.ndcgDiscounts(10).toMap
    def c(rel: Long, rank: Long): Long =
      math.round(((1L << rel) - 1).toDouble * disc(rank) * 1e9)
    // system ranking (from the bm25 spec above): doc1, doc4, doc3, doc2
    val dcg = c(2, 1) + c(4, 2) + c(1, 3) + c(1, 4)
    // ideal: rel desc, doc_id asc → doc4(4), doc1(2), doc2(1), doc3(1)
    val idcg = c(4, 1) + c(2, 2) + c(1, 3) + c(1, 4)
    val ndcg = math.round(dcg.toDouble / idcg * 1e6)
    assert(got.head == ((1L, dcg, idcg, ndcg)))
  }

  test("ndcgAtK is 1.0 when the system ranking is the ideal ranking") {
    import spark.implicits._
    // single term, tf-ordered docs of equal length: bm25 ranks by tf,
    // rel is capped tf → system order == ideal order
    val docs = Seq(
      (1L, "t t t t x x x x"),
      (2L, "t t t x x x x x"),
      (3L, "t x x x x x x x")).toDF("doc_id", "text")
    val got = TextRank.ndcgAtK(docs, Seq(7L -> Seq("t")), "doc_id", "text", k = 5)
      .collect().head
    assert(got.getLong(3) == 1000000L)
    assert(got.getLong(1) == got.getLong(2))
  }
}
