package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val prose = "the quick brown fox jumps over the lazy dog and runs " +
    "into the green field again today with a friend of the family"

  private def corpus() = Seq(
    (1L, prose),                                  // keeper
    (2L, prose),                                  // exact dup of 1
    (3L, prose + " tonight"),                     // near-dup of 1
    (4L, "x x x x x x x x x x x x x x x x x x"),  // degenerate: quality fails
    (5L, "el perro corre por la calle y se va a la casa de la familia " +
      "cada tarde con el gato y el loro de la casa"), // spanish keeper
    (6L, prose.replace("fox", "wolf"))            // near-dup of 1 (1 token)
  ).toDF("doc_id", "text")

  test("curate: quality gate, exact dedup, near-dup removal, fingerprints") {
    // quality 0.6: the degenerate doc scores exactly 0.5 (len+ttr bands
    // pass) and must fall below the gate
    val out = Curation.curate(corpus(), "doc_id", "text",
      Curation.Config(minQuality = 0.6)).cache()
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L))           // representative survives
    assert(!ids.contains(2L))          // exact dup removed
    assert(!ids.contains(3L))          // near-dup (appended token, J≈0.95)
    assert(!ids.contains(4L))          // low quality removed
    assert(ids.contains(6L))           // J≈0.76 < 0.8: kept at default
    assert(ids.contains(5L))           // distinct doc survives
    val langs = out.select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(langs(5L) === "es")
    assert(out.filter(col("fingerprint").isNull).isEmpty)
  }

  test("lower near-dup threshold also removes the one-token-changed doc") {
    val out = Curation.curate(corpus(), "doc_id", "text",
      Curation.Config(minQuality = 0.6, nearDupJaccard = 0.7))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(6L) && ids.contains(1L))
  }

  test("language allowlist drops other languages") {
    val out = Curation.curate(corpus(), "doc_id", "text",
      Curation.Config(keepLangs = Seq("en")))
    assert(!out.select("doc_id").as[Long].collect().contains(5L))
  }

  test("curation is idempotent: curating the output changes nothing") {
    val once = Curation.curate(corpus(), "doc_id", "text")
      .select("doc_id", "text")
    val twice = Curation.curate(once, "doc_id", "text")
      .select("doc_id", "text")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
