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
}
