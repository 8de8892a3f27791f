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

  /** Adjacent-token bigram stream `(idCol, w1, w2)` — a PER-ROW projection
    * (`transform` over an index sequence, then one explode): the token
    * array is built once per document and indexed in place, so bigram
    * extraction costs zero shuffles and no token-level self-join. */
  def bigramStream(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    // zip of two shifted slices, not element_at probes from an index
    // lambda: the probe form re-ran the split per element (interpreted
    // HOFs have no cross-lambda subexpression elimination) — O(L²)
    // character work per doc; the slices evaluate the split twice
    df.filter(size(toks) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col(idCol), col("b.w1"), col("b.w2"))
  }

  /** Bigram model counts trained on `train`: the `(w1, w2) → c12` table
    * plus the unigram artifacts of [[unigramCounts]] (for interpolation
    * smoothing). One additional groupBy over the bigram stream. */
  def bigramModel(train: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val (counts0, _) = unigramCounts(train, textCol)
    // barrier on the unigram table: the score join consumes it THREE ways
    // (c(w1), c(w2), and the (N, V) totals) — un-truncated, each consumer
    // re-runs the corpus token aggregate. The table is vocabulary-sized,
    // so the checkpoint is cheap where the re-scans are not.
    val counts = counts0.localCheckpoint()
    val totals = counts.agg(
      sum(col("ct")).as("n_train"), count(lit(1)).as("v_train"))
    val bi = bigramStream(train.select(lit(0L).as("_id"), col(textCol)),
        "_id", textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    (bi, counts, totals)
  }

  /** Interpolated-bigram bits-per-token: per bigram,
    * `p = λ·c(w1,w2)/c(w1) + (1−λ)·(c(w2)+1)/(N+V+1)` (Jelinek–Mercer
    * interpolation with the [[unigramCounts]] add-one unigram as the
    * backoff mass; λ = 0.9) — the CCNet perplexity filter upgraded one
    * Markov order. Unseen `w1` drops the ML term entirely; unseen `w2`
    * still scores via the OOV share, so foreign-reference scoring stays
    * well-defined.
    *
    * Scale shape: the score join hits the bigram table on `(w1, w2)` and
    * the unigram table on each side — model-sized tables that broadcast
    * when small and hash-join when not; the corpus-sized stream is
    * touched once. Determinism: per-bigram `−log2 p × 1e6` rounds to a
    * long before the per-doc sum (the q78 discipline).
    *
    * @return (idCol, n_bigrams, bits_fp6)
    */
  def scoreBitsPerBigram(docs: DataFrame, bi: DataFrame, counts: DataFrame,
      totals: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = bigramStream(docs, idCol, textCol)
    val c1 = counts.select(col("term").as("w1"), col("ct").as("c1"))
    val cu2 = counts.select(col("term").as("w2"), col("ct").as("cu2"))
    val ml = when(col("c1").isNull, lit(0.0))
      .otherwise(lit(0.9) * (coalesce(col("c12"), lit(0L)).cast("double") / col("c1")))
    val backoff = lit(0.1) *
      ((coalesce(col("cu2"), lit(0L)) + lit(1L)).cast("double") /
        (col("n_train") + col("v_train") + lit(1L)))
    val costs = bg
      .join(bi, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cu2, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        round(-log2(ml + backoff) * lit(1e6)).cast("long").as("c"))
    costs.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      round(sum(col("c")).cast("double") / count(lit(1))).cast("long")
        .as("bits_fp6"))
  }
}
