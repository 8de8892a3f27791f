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
  *  - gram extraction is a per-doc projection: one O(n_tok) native
  *    rolling-hash pass ([[graft.functions.SpanKeysExpr]]) emits a
  *    64-bit key per n-token window — the gram travels as a long, and
  *    the window text is never even materialized (the former
  *    md5-over-window-string form built and hashed n·span bytes per
  *    doc; identical-window ⇒ identical-key is the only property the
  *    dup set needs, and distinct-window collisions are the vanishing
  *    ~n²/2⁶⁵ of [[graft.functions.FingerprintUtil
  *    .distinctShingleHashes]]);
  *  - SINGLETON PRUNING (VERDICT r9 #2): most grams occur exactly once,
  *    yet the gram groupBy used to shuffle one ~40 B row per token
  *    position — the heaviest bytes-per-input-byte shuffle in the
  *    engine. A pre-pass now counts occurrences per xxhash64 BUCKET
  *    (bucket count chosen from the corpus gram count by the autoBits
  *    density argument; the bucket groupBy shuffles 16 B int rows,
  *    partial-combined) and folds the duplicated buckets into a q86
  *    [[Bloom]] filter; only grams whose bucket MIGHT be duplicated
  *    reach the md5 keying, the gram shuffle, and the coverage probe.
  *    The rewrite is a semantic IDENTITY, certified the q86 way (the
  *    oracle runs the plain form): a duplicated gram's occurrences all
  *    share one bucket, so its bucket counts ≥ 2 and the Bloom keeps it
  *    (no false negatives); a singleton that survives via bucket
  *    collision or Bloom fpp is eliminated by the EXACT per-gram
  *    recount downstream. Beyond the 2^26 bucket cap (~8 M grams at the
  *    8×-occupancy rule) pruning degrades gracefully toward the plain
  *    plan — collisions only cost bytes, never answers;
  *  - the duplicate-gram set is one groupBy on the (pruned) gram key;
  *    the occurrence→duplicate check is a semi-join that REUSES that
  *    partitioning (no second shuffle of the gram stream);
  *  - coverage is a positions explode + per-doc distinct-count — rows
  *    only for occurrences that matched, never the whole corpus.
  *
  * Determinism: counts and positions are integers end-to-end; the one
  * double (`dup_frac`) is a single division of two longs, expression-
  * identical in the oracle. The gram key choice is INVISIBLE in the
  * output (coverage depends only on the window-equality relation, which
  * any injective key realizes), so the oracle replays the plain
  * md5-gram construction and the hash-match certifies the rolling-key
  * form — the q86 rewrite-identity discipline.
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
  /** The shared gram pipeline: tokenization, the singleton-pruned
    * rolling-key gram stream, and the exact duplicated-gram set. Returned
    * as (toks, lens, grams, dup) for [[dupSpanCoverage]] (measure) and
    * [[removeDupSpans]] (clean) to build on. */
  private def gramPipeline(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    val toks = docs.select(col(idCol),
      filter(split(col(textCol), " "), t => t =!= "").as("toks"))
    val lens = toks.filter(size(col("toks")) >= 1)
      .select(col(idCol), size(col("toks")).cast("long").as("n_tok"))
    // occupancy-ruled bucket count (the autoBits argument): smallest
    // power of two holding expected bucket load ≤ 1/8 gram, so a
    // singleton's bucket is rarely polluted. Gram count is ESTIMATED from
    // the optimizer's size stats (≈ one gram per ~6 source bytes) — no
    // counting job; the estimate only tunes pruning efficiency, never
    // answers. Capped at 2^26: past ~8M grams occupancy rises and pruning
    // degrades gracefully toward the plain plan (collisions cost bytes,
    // not answers)
    val nGramsEst = math.max(1L,
      (docs.queryExecution.optimizedPlan.stats.sizeInBytes / 6).toLong)
    var nBuckets = 1L << 16
    while (nBuckets < (1L << 26) && nBuckets < 8 * nGramsEst) nBuckets <<= 1
    // per-doc 64-bit window keys in O(n_tok) long ops (native
    // rolling-hash kernel) — these ARE the gram keys: window text is
    // never materialized and nothing md5s n·span bytes per doc
    val withKeys = toks.filter(size(col("toks")) >= spanTokens)
      .select(col(idCol),
        graft.functions.TextFunctions.span_keys(
          col("toks"), spanTokens).as("ks"))
    val dupBuckets = withKeys.select(explode(col("ks")).as("k"))
      .select(pmod(col("k"), lit(nBuckets)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("b"))
    // q86 primitive: the duplicated-bucket set rides into the gram stream
    // as a literal-embedded might_contain predicate. Sized by the bucket
    // cap (a hard upper bound on duplicated buckets) — oversizing only
    // lowers the effective fpp below the 1% target
    val mightBeDup = graft.ops.Bloom.mightContainKey(
      dupBuckets, "b", pmod(col("g"), lit(nBuckets)),
      math.min(nGramsEst, nBuckets), 0.01)
    val grams = withKeys
      .select(col(idCol), posexplode(col("ks")).as(Seq("pos0", "g")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("g"))
      .filter(mightBeDup)
    // EXACT recount over the surviving grams: every occurrence of a truly
    // duplicated gram survived the bucket filter (identical text ⇒ same
    // key ⇒ same bucket), so these counts equal the unpruned counts for
    // every gram that can pass n > 1 — bucket-collision singletons count
    // 1 and fall
    val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("g"))
    (toks, lens, grams, dup)
  }

  /** Per-document duplicated-span coverage (the MEASURE side).
    *
    * @param spanTokens window width in tokens (Lee et al. use 50; small
    *                   corpora want less)
    * @return (idCol, n_tok, covered, dup_frac) for every doc with ≥1
    *         token; `covered` counts positions under ≥1 duplicated
    *         window
    */
  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    val (_, lens, grams, dup) = gramPipeline(docs, idCol, textCol, spanTokens)
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

  /** Duplicated-span REMOVAL (the CLEAN side of Lee et al.'s ExactSubstr:
    * q79 measures, this rewrites): every token position covered by a
    * duplicated n-token window is dropped, and the document is rebuilt
    * from the surviving tokens (single-space joined) — the aggressive
    * boilerplate-strip variant, deterministic and engine-replayable
    * (keep-first-occurrence needs a global occurrence order; the strip
    * form needs none, which is also what makes it embarrassingly
    * parallel at 100 TB).
    *
    * Scale shape: the covered-position set rides back to the document as
    * one (id → sorted positions array) join — token-level rows exist
    * only inside the per-doc rebuild projection, never in a shuffle. The
    * rebuild's `array_contains` per token costs O(n_tok · |cov|) in the
    * worst (fully-duplicated) document; typical covered fractions keep
    * it linear, and the gram stream above it is the q79 singleton-pruned
    * one.
    *
    * @return (idCol, clean_text, n_tok, n_removed) for every doc with
    *         ≥1 token; `clean_text` is "" when everything was removed
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    val (toks, lens, grams, dup) = gramPipeline(docs, idCol, textCol, spanTokens)
    val covered = grams.join(dup, Seq("g"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(spanTokens - 1))).as("p"))
      .groupBy(col(idCol))
      .agg(collect_set(col("p")).as("cov"))
    toks.filter(size(col("toks")) >= 1)
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("toks"),
        coalesce(col("cov"), array().cast("array<int>")).as("cov"))
      .select(col(idCol),
        concat_ws(" ", filter(
          zip_with(col("toks"), sequence(lit(1), size(col("toks"))),
            (t, i) => struct(t.as("t"), i.as("i"))),
          x => !array_contains(col("cov"), x.getField("i")))
          .getField("t")).as("clean_text"),
        size(col("toks")).cast("long").as("n_tok"),
        size(col("cov")).cast("long").as("n_removed"))
  }
}
