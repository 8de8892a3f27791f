package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the perplexity-proxy filter
  * of CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data"), reduced to its distributed
  * core: train token statistics on a reference corpus, score every
  * document in bits-per-token, gate on the score. Low bits = boilerplate/
  * repetitive (the corpus's own cliches); high bits = rare-token-heavy
  * (gibberish, wrong language, or genuinely novel) — curation pipelines
  * cut both tails.
  *
  * Model: add-one-smoothed unigram with an explicit OOV class —
  * `p(t) = (c(t) + 1) / (N + V + 1)` where `c(t)` is the train count
  * (0 if unseen), `N` total train tokens, `V` train vocabulary size.
  * The `V + 1` denominator reserves one smoothing share for the OOV
  * class, so scoring a corpus against a FOREIGN reference LM (the real
  * CCNet setup) is well-defined, not just self-scoring.
  *
  * Scale shape:
  *  - training is ONE groupBy over the token stream (map-side partial
  *    count) plus a two-long global reduce for (N, V);
  *  - scoring joins the token stream to the count table on term — the
  *    one unavoidable shuffle — then aggregates per doc; the count
  *    table is usually vocabulary-sized (≪ corpus) and broadcasts when
  *    under the threshold, degrading gracefully to a hash join when not;
  *  - (N, V) ride a 1-row broadcast, never a driver collect.
  *
  * Determinism (the Det discipline): the per-token cost
  * `-log2(p) × 1e6` rounds to a LONG before the per-doc sum (exact,
  * order-free); the per-doc mean is one double division + round,
  * expression-tree-identical in the oracle. The ulp wobble of `log2`
  * (Java Math vs libm) is absorbed by the 1e-6 rounding, q76-style.
  */
object LangModel {

  /** Train-side artifacts: per-term counts plus the (N, V) singleton.
    * Both are DataFrames — nothing is collected to the driver. */
  def unigramCounts(train: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    val tok = train.select(
      explode(split(col(textCol), " ")).as("term")).filter(col("term") =!= "")
    val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("ct"))
    val totals = counts.agg(
      sum(col("ct")).as("n_train"), count(lit(1)).as("v_train"))
    (counts, totals)
  }

  /** Bits-per-token score for every document with ≥1 token, against a
    * trained unigram model. Unseen terms cost the OOV share (ct = 0).
    *
    * @return (idCol, n_tok, bits_fp6): mean −log2 p per token × 1e6 as
    *         a long; docs with no tokens are absent (score undefined)
    */
  def scoreBitsPerToken(docs: DataFrame, counts: DataFrame, totals: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("term")).filter(col("term") =!= "")
    // left join: OOV terms keep scoring via the smoothing mass
    val p = (coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
      (col("n_train") + col("v_train") + lit(1L))
    val costs = tok
      .join(counts, Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        round(-log2(p) * lit(1e6)).cast("long").as("c"))
    costs.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tok"),
      round(sum(col("c")).cast("double") / count(lit(1))).cast("long")
        .as("bits_fp6"))
  }

  /** Self-scoring convenience: train and score on the same corpus (the
    * q78 gate form; every term is in-vocabulary by construction). */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (counts, totals) = unigramCounts(docs, textCol)
    scoreBitsPerToken(docs, counts, totals, idCol, textCol)
  }
}
