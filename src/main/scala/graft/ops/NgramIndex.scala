package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-trigram inverted index for substring search — the pg_trgm
  * pattern: a `LIKE '%pattern%'` over a 100 TB corpus cannot scan text,
  * so the corpus is indexed ONCE into distinct (trigram, doc_id) postings
  * and each query prunes to documents containing ALL the pattern's
  * trigrams (a necessary condition) before the exact `contains` verify
  * touches any text.
  *
  * Scale shape: the posting build is one explode + distinct (per-doc work
  * linear in characters) and is an INDEX — amortized over every query
  * that follows. A query's cost is proportional to the posting lists of
  * ITS trigrams (the broadcast semi-join prunes the posting scan), never
  * the corpus; the final verify reads only candidate documents. The
  * candidate check (count of matched grams == pattern gram count) is the
  * standard k-way posting intersection as one aggregation.
  */
object NgramIndex {

  /** Distinct (doc_id, g) character-trigram postings. Documents shorter
    * than 3 characters produce no postings (and can never match a
    * ≥3-char pattern).
    *
    * Shape matters here: the per-doc distinct gram set is built INSIDE
    * the row by the codegen'd [[graft.functions.CharNgramsExpr]] kernel
    * and then exploded — so the generator emits 3-char grams, never
    * (text, pos) pairs that would ship the full document once per
    * character position, and per-doc distinctness costs ZERO shuffle.
    * Measured at sf0.1: naive explode→substring→distinct 3.8 s;
    * declarative array_distinct∘transform (interpreted HOF) 2.1 s;
    * this kernel 1.5 s — and 0.73 s once the caller `spread()`s a
    * single-row-group corpus so the kernel parallelizes (q24 note). */
  def trigramPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.char_ngrams(col("text"), 3)).as("g"))

  /** Index-accelerated substring search: per pattern, the candidate count
    * (docs containing all pattern trigrams) and the verified match count
    * (`contains`). Patterns must be ≥3 chars.
    *
    * @return (pattern_id, n_candidates, n_matched) — one row per pattern,
    *         zero-match patterns included with zeros
    */
  def substringSearch(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[(Long, String)]): DataFrame = {
    require(patterns.forall(_._2.length >= 3), "patterns must be >= 3 chars")
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = patterns.toDF("pattern_id", "pat")
    val pgrams = patterns
      .flatMap { case (pid, p) => p.sliding(3).toSeq.distinct.map(g => (pid, g)) }
      .toDF("pattern_id", "g")
    val ngrams = patterns
      .map { case (pid, p) => (pid, p.sliding(3).toSeq.distinct.size.toLong) }
      .toDF("pattern_id", "ng")
    val postings = trigramPostings(docs, idCol, textCol)
    val cand = postings
      .join(broadcast(pgrams), Seq("g"))
      .groupBy(col("pattern_id"), col("doc_id"))
      .agg(count(lit(1)).as("hit"))
      .join(broadcast(ngrams), Seq("pattern_id"))
      .filter(col("hit") === col("ng"))
      .select(col("pattern_id"), col("doc_id"))
    // candidate count and verified count in ONE lineage (a verify flag,
    // not a second branch): two consumers of `cand` would re-run the
    // whole posting build per count
    val flagged = cand
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        Seq("doc_id"))
      .join(broadcast(pats), Seq("pattern_id"))
      .select(col("pattern_id"),
        contains(col("text"), col("pat")).cast("long").as("m"))
    val counts = flagged.groupBy(col("pattern_id"))
      .agg(count(lit(1)).as("n_candidates"), sum(col("m")).as("n_matched"))
    pats.select(col("pattern_id"))
      .join(counts, Seq("pattern_id"), "left")
      .select(col("pattern_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
  }
}
