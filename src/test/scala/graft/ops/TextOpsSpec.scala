package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: trigrams, short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextOps.shingles(TextOps.tokenize(col("text")), 3).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("langId: classifies real multilingual snippets") {
    val df = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("el perro corre por la calle y se va", "es"),
      ("der Hund und die Katze sind nicht da", "de"),
      ("le chat et le chien sont pour une maison", "fr")
    ).toDF("text", "expected")
    val got = df.select(TextOps.langId(col("text")).as("pred"), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TextOps.fingerprint(TextOps.tokenize(col("text"))).as("fp"))
    val fps = df.as[Long].collect()
    assert(fps(0) === fps(2))
    assert(fps(0) !== fps(1))
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }

  // corpus stressing edge cases: multilingual, repeated/empty tokens,
  // punctuation, short docs, unicode
  private def mixedCorpus() = Seq(
    "the cat sat on the mat and it is happy because the sun is out today",
    "el perro corre por la calle y se va lejos de la casa grande",
    "der Hund und die Katze sind nicht da heute",
    "le chat et le chien sont pour une maison",
    "的 是 了 在 我 有 和 就 不 人",
    "x x x x x x x x x x x x x x x x x x x x",
    "ab", "", "a  b   c", "one-token",
    "Mixed CASE Tokens With Some Punctuation! And, more. tokens? here"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("native text kernels equal declarative forms on edge-case corpus") {
    val c = mixedCorpus()
    val en = TextOps.langProfiles.head._2
    val both = c.select(
      TextOps.qualityScore(col("text"), en).as("qn"),
      TextOps.qualityScoreDeclarative(col("text"), en).as("qd"),
      TextOps.langId(col("text")).as("ln"),
      TextOps.langIdDeclarative(col("text")).as("ld"),
      TextOps.fingerprintMd5(TextOps.tokenize(col("text"))).as("fn"),
      TextOps.fingerprintMd5Declarative(TextOps.tokenize(col("text"))).as("fd"),
      graft.functions.TextFunctions.distinct_shingles(col("text"), 3).as("sn"),
      array_distinct(TextOps.shingles(TextOps.tokenize(col("text")), 3)).as("sd"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), "quality")
      assert(r.getString(2) === r.getString(3), "langId")
      assert(r.getLong(4) === r.getLong(5), "fingerprint")
      assert(r.getSeq[String](6) === r.getSeq[String](7), "shingles")
    }
  }

  test("fingerprint of an array with a null element is null (both forms)") {
    // checkInputDataTypes admits containsNull arrays, so SQL users can
    // feed one — the native kernel must propagate null like the
    // declarative HOF fold, not NPE on the executor
    val arr = Seq(Tuple1(Seq[String]("a", null, "b"))).toDF("toks")
    val r = arr.select(
      TextOps.fingerprintMd5(col("toks")).as("fn"),
      TextOps.fingerprintMd5Declarative(col("toks")).as("fd")).collect().head
    assert(r.isNullAt(0), "native")
    assert(r.isNullAt(1), "declarative")
  }

  test("quality score: prose scores higher than degenerate text") {
    val en = TextOps.langProfiles.head._2
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs into the green field again today",
      "x x x x x x x x x x x x x x x x x x x x",
      "ab").toDF("text")
      .select(TextOps.qualityScore(col("text"), en).as("q"))
    val qs = df.as[Double].collect()
    assert(qs(0) === 1.0)
    assert(qs(1) < qs(0)) // repetition: type-token ratio + stopword fail
    assert(qs(2) <= 0.5)  // too short: length band fails
  }

  test("repetition stats: kernel equals relational derivation on edge corpus") {
    import org.apache.spark.sql.expressions.Window
    val c = mixedCorpus()
    val native = c.select(col("doc_id"),
      TextOps.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.top_bigram_frac"),
        col("r.dup_trigram_frac"), col("r.max_run"))
    // independent relational derivation: explode + window-lead n-grams,
    // group for the bigram mode, distinct for trigrams, gaps-and-islands
    // for runs — the same construction the q59 oracle uses in DuckDB
    val toks = c.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bi = toks
      .withColumn("nx", lead(col("tok"), 1).over(w))
      .filter(col("nx").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nx")).as("bg"))
    val topb = bi.groupBy(col("doc_id"), col("bg")).count()
      .groupBy(col("doc_id"))
      .agg((max(col("count")).cast("double") / sum(col("count"))).as("tf"))
    val tri = toks
      .withColumn("n1", lead(col("tok"), 1).over(w))
      .withColumn("n2", lead(col("tok"), 2).over(w))
      .filter(col("n2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("n1"), col("n2")).as("tg"))
    val dup = tri.groupBy(col("doc_id"))
      .agg(((count(lit(1)) - countDistinct(col("tg"))).cast("double") /
        count(lit(1))).as("df"))
    val runs = toks
      .withColumn("g", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id"), col("tok")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("tok"), col("g")).count()
      .groupBy(col("doc_id")).agg(max(col("count")).as("mr"))
    val expected = c.select(col("doc_id"))
      .join(topb, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .join(runs, Seq("doc_id"), "left")
    val n = native.orderBy(col("doc_id")).collect()
    val e = expected.orderBy(col("doc_id")).collect()
    assert(n.length === e.length)
    n.zip(e).foreach { case (a, b) =>
      assert(a.isNullAt(1) === b.isNullAt(1), s"null tf ${a.getLong(0)}")
      if (!a.isNullAt(1)) assert(a.getDouble(1) === b.getDouble(1), s"tf ${a.getLong(0)}")
      assert(a.isNullAt(2) === b.isNullAt(2), s"null df ${a.getLong(0)}")
      if (!a.isNullAt(2)) assert(a.getDouble(2) === b.getDouble(2), s"df ${a.getLong(0)}")
      assert(a.getLong(3) === b.getLong(3), s"run ${a.getLong(0)}")
    }
  }

  test("repetition stats: hand-checked values") {
    val r = Seq((1L, "a b a b a"), (2L, "x x x y"), (3L, "solo"))
      .toDF("doc_id", "text")
      .select(TextOps.repetitionStats(col("text")).as("r"))
      .select(col("r.top_bigram_frac"), col("r.dup_trigram_frac"), col("r.max_run"))
      .collect()
    // "a b a b a": bigrams [ab, ba, ab, ba] → top 2/4; trigrams
    // [aba, bab, aba] → dup (3-2)/3; runs all 1
    assert(r(0).getDouble(0) === 0.5)
    assert(r(0).getDouble(1) === 1.0 / 3.0)
    assert(r(0).getLong(2) === 1L)
    // "x x x y": bigrams [xx, xx, xy] → 2/3; trigrams [xxx, xxy] → 0; run 3
    assert(r(1).getDouble(0) === 2.0 / 3.0)
    assert(r(1).getDouble(1) === 0.0)
    assert(r(1).getLong(2) === 3L)
    // single token: no n-grams → nulls, run 1
    assert(r(2).isNullAt(0) && r(2).isNullAt(1))
    assert(r(2).getLong(2) === 1L)
  }

  test("vocab coverage: hand-checked OOV and fertility on a tiny corpus") {
    val docs = Seq(
      (1L, "A", "a a b"), (2L, "A", "a b"), (3L, "B", "c c"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.vocabCoverage(docs, vocabSize = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // vocab = {a} (count 3 beats b=2, c=2)
    // A: 2 docs, 5 tokens, 2 oov (the b's), chars 5+3=8
    assert(out("A") === (("A", 2L, 5L, 2L, 400000L, 1600000L)))
    // B: 1 doc, 2 tokens, both oov, chars 3
    assert(out("B") === (("B", 1L, 2L, 2L, 1000000L, 1500000L)))
  }

  test("BPE learn+encode: hand-traced merges, greedy-left application") {
    val docs = Seq(
      (1L, "A", "ab ab ab cd"),
      (2L, "B", "abc cd xy"),
      (3L, "C", "aab")
    ).toDF("doc_id", "source", "text")
    // round 1: pair (a,b) weight 3(ab)+1(abc)+1(aab)=5 wins → merge a+b
    //   ab→[ab], abc→[ab,c], aab→[a,ab] (hit consumes position 2 only)
    // round 2: (c,d) weight 2 beats (ab,c)=1 and (a,ab)=1 → merge c+d
    val out = TextOps.bpeFertility(docs, rounds = 2)
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") === (("A", 4L, 4L, 1000000L, "a+b|c+d")))
    assert(out("B") === (("B", 3L, 5L, 1666667L, "a+b|c+d"))) // abc=2,cd=1,xy=2
    assert(out("C") === (("C", 1L, 2L, 2000000L, "a+b|c+d"))) // aab→[a,ab]
  }

  test("token novelty: document-frequency stats on a hand corpus") {
    val d = Seq((0L, "a b c"), (1L, "a b"), (2L, "a x"))
      .toDF("doc_id", "text")
    val got = TextOps.tokenNovelty(d, "doc_id", "text")
      .orderBy(col("id")).collect()
    // df: a→3 b→2 c→1 x→1
    assert(got(0).getLong(1) === 3L)          // n_distinct
    assert(got(0).getDouble(2) === 2.0)       // (3+2+1)/3
    assert(got(0).getLong(3) === 3L)          // max_df
    assert(got(0).getLong(4) === 1L)          // hapax: c
    assert(got(1).getDouble(2) === 2.5)       // (3+2)/2
    assert(got(1).getLong(4) === 0L)
    assert(got(2).getDouble(2) === 2.0)       // (3+1)/2
    assert(got(2).getLong(4) === 1L)          // x
  }

  test("redactPii: emails and phones scrubbed, counts audited, clean text untouched") {
    val rows = Seq(
      "mail bob.smith+x@corp.example.co and carol@ex.org now",
      "call 555-123-4567 or 555.987.6543 today",
      "mixed a@b.io then 111-222-3333",
      "clean text with w123 tokens and no pii at all",
      "almost: not@an@ email 12-34-56 555-12-3456")
      .toDF("text")
      .select(
        TextOps.redactPii(col("text")).as("r"),
        TextOps.emailCount(col("text")).as("ne"),
        TextOps.phoneCount(col("text")).as("np"))
      .collect()
    assert(rows(0).getString(0) === "mail <EMAIL> and <EMAIL> now")
    assert(rows(0).getInt(1) === 2 && rows(0).getInt(2) === 0)
    assert(rows(1).getString(0) === "call <PHONE> or <PHONE> today")
    assert(rows(1).getInt(2) === 2)
    assert(rows(2).getString(0) === "mixed <EMAIL> then <PHONE>")
    assert(rows(3).getString(0) === "clean text with w123 tokens and no pii at all")
    assert(rows(3).getInt(1) === 0 && rows(3).getInt(2) === 0)
    // "not@an@ email": the first @-run has no dot-TLD, so only a trailing
    // fragment could match — assert no phone fires on short digit groups
    assert(rows(4).getInt(2) === 0)
  }

  test("chunkDocuments: overlap windows, truncated tail, no contained chunk") {
    // 10 tokens, chunk 4, overlap 2 (stride 2): starts 1,3,5,7 — a start at 9
    // would be wholly inside [7,10], so it must not be emitted
    val df = Seq((1L, (1 to 10).map("t" + _).mkString(" "))).toDF("id", "text")
    val got = TextOps.chunkDocuments(df, "id", "text", 4, 2)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t3 t4 t5 t6"),
      (2L, 5L, 4L, "t5 t6 t7 t8"),
      (3L, 7L, 4L, "t7 t8 t9 t10")))
  }

  test("chunkDocuments: short doc = one chunk, empty doc = none, determinism") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "  "), (4L, "x y z w v")).toDF("id", "text")
    val got = TextOps.chunkDocuments(df, "id", "text", 4, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4))).sorted.toSeq
    assert(got === Seq((1L, 0L, "a b"), (4L, 0L, "x y z w"), (4L, 1L, "w v")))
    val again = TextOps.chunkDocuments(df.repartition(5), "id", "text", 4, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).sorted.toSeq
    assert(got === again)
  }

  test("bpePairCounts: hand-checked pair weights, word-boundary isolation") {
    // "ab ab cd" ×2 docs: 'ab' wc=4, 'cd' wc=2
    val df = Seq((1L, "ab ab cd"), (2L, "ab ab cd")).toDF("id", "text")
    val pairs = TextOps.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pairs("ab") == 4L) // in-word pair from every 'ab' occurrence
    assert(pairs("cd") == 2L)
    assert(pairs("b</w>") == 4L && pairs("d</w>") == 2L) // end markers
    // no cross-word pair ("ba", "bc", "da"...) may ever appear
    assert(!pairs.contains("ba") && !pairs.contains("bc"))
    // single-char words produce only their end-marker pair
    val single = TextOps.bpePairCounts(Seq((1L, "x x y")).toDF("id", "text"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(single == Map("x</w>" -> 2L, "y</w>" -> 1L))
  }
}
