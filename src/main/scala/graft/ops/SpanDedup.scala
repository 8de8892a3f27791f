package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicated-span detection — the ExactSubstr criterion of Lee et al.
  * 2021 ("Deduplicating Training Data Makes Language Models Better"),
  * reduced to its distributed core: a token position is DUPLICATED when
  * it is covered by some n-token window that occurs verbatim anywhere
  * else in the corpus (another document, or elsewhere in the same one).
  * Per-document duplicated-span coverage is the signal the paper cuts
  * on — it catches boilerplate shared across otherwise-distinct pages,
  * the case whole-document dedup (q16) and near-dup (q24) both miss.
  *
  * Scale shape:
  *  - gram extraction is a per-doc projection (positions × an md5 over
  *    the n-token slice — the gram travels as a 128-bit key, never as
  *    the token text);
  *  - the duplicate-gram set is one groupBy on the gram key; the
  *    occurrence→duplicate check is a semi-join that REUSES that
  *    partitioning (no second shuffle of the gram stream);
  *  - coverage is a positions explode + per-doc distinct-count — rows
  *    only for occurrences that matched, never the whole corpus.
  *
  * Determinism: counts and positions are integers end-to-end; the one
  * double (`dup_frac`) is a single division of two longs, expression-
  * identical in the oracle. md5 is the oracle-portable gram key (the
  * q24 discipline; swap XXH64 via the q74 agreement harness when the
  * oracle is out of the loop).
  */
object SpanDedup {

  /** Per-document duplicated-span coverage.
    *
    * @param spanTokens window width in tokens (Lee et al. use 50; small
    *                   corpora want less)
    * @return (idCol, n_tok, covered, dup_frac) for every doc with ≥1
    *         token; `covered` counts positions under ≥1 duplicated
    *         window
    */
  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    val toks = docs.select(col(idCol),
      filter(split(col(textCol), " "), t => t =!= "").as("toks"))
    val lens = toks.filter(size(col("toks")) >= 1)
      .select(col(idCol), size(col("toks")).cast("long").as("n_tok"))
    // (doc, pos, gram-key) for every n-token window; md5 keys the window
    val grams = toks.filter(size(col("toks")) >= spanTokens)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("toks")) - lit(spanTokens - 1)),
        i => struct(i.as("pos"),
          md5(concat_ws(" ", slice(col("toks"), i, lit(spanTokens)))).as("g"))))
        .as("e"))
      .select(col(idCol), col("e.pos"), col("e.g"))
    val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("g"))
    val cov = grams.join(dup, Seq("g"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(spanTokens - 1))).as("p"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("p")).as("covered"))
    lens.join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        (coalesce(col("covered"), lit(0L)).cast("double") / col("n_tok"))
          .as("dup_frac"))
  }
}
