package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text primitives for training-data pipelines: tokenization, shingling,
  * quality scoring, language ID, fingerprinting. Everything is built from
  * codegen'd expressions (split / higher-order array functions / hash
  * functions) — no UDFs — so the hot path stays inside whole-stage codegen
  * and distributes trivially (per-row, no shuffle).
  */
object TextOps {

  /** Whitespace tokenizer (the corpus is space-separated; use
    * [[tokenizeRegex]] for general text). */
  def tokenize(text: Column): Column = split(text, " ")

  def tokenizeRegex(text: Column): Column =
    split(lower(text), "[^\\p{L}\\p{N}]+")

  /** Word n-gram shingles: `["a b c", "b c d", ...]`; empty when the doc has
    * fewer than n tokens.
    *
    * Built by zipping n shifted slices, NOT by probing `toks` from an
    * index-sequence lambda: interpreted HOF lambdas get no cross-lambda
    * subexpression elimination, so `slice(toks, i, n)` inside a
    * `transform` re-evaluates the FULL `toks` expression per element —
    * O(L²) character work when the caller passes `split(text)` inline
    * (the q158 probe class, measured 4×). The slices evaluate `toks`
    * exactly n times per row; the lambda touches only struct fields. */
  def shingles(toks: Column, n: Int): Column = {
    val win = size(toks) - (n - 1)
    val zipped = arrays_zip((1 to n).map(k =>
      slice(toks, lit(k), win).as(s"t$k")): _*)
    when(size(toks) >= n,
      transform(zipped, s =>
        concat_ws(" ", (1 to n).map(k => s.getField(s"t$k")): _*)))
      .otherwise(array())
  }

  // ---- PII scrubbing --------------------------------------------------

  /** Email-address pattern (pragmatic training-data form, not RFC 5322:
    * the goal is scrubbing obvious PII at volume, and the simple pattern
    * is deterministic across regex engines — Java here, RE2 in the
    * DuckDB oracle — which an RFC-complete monster is not). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone pattern: 3-3-4 digit groups with -/. separators. */
  val PhoneRe = "\\d{3}[-.]\\d{3}[-.]\\d{4}"

  /** PII redaction — a first-class training-data-pipeline op: replace
    * every email with `<EMAIL>`, then every phone-shaped digit group
    * with `<PHONE>`. Pure `regexp_replace` chain: codegen'd, per-row, no
    * shuffle, linear in bytes — the only shape that survives scrubbing
    * 100 TB. Email first so a digit group inside a local-part can never
    * be half-eaten by the phone pass. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Match counts per row for audit metrics (how much PII a source
    * carries is itself a curation signal). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  // ---- quality scoring ------------------------------------------------

  def tokenCount(toks: Column): Column = size(toks).cast("long")

  def distinctTokenCount(toks: Column): Column =
    size(array_distinct(toks)).cast("long")

  /** Fraction of tokens that are stopwords — high values ≈ natural prose,
    * near-zero ≈ tables/boilerplate. */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*))).cast("double") /
      size(toks)

  /** Mean characters per token (long "words" ≈ URLs, base64, code). */
  def charsPerToken(text: Column, toks: Column): Column =
    length(text).cast("double") / size(toks)

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^\\p{L}\\p{N} ]", ""))).cast("double") /
      length(text)

  /** Type-token ratio: distinct/total — degenerate repetition scores low. */
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** Composite quality score in [0,1]: the usual length/stopword/repetition
    * heuristics, each clamped to a plausible band. Native codegen'd kernel
    * ([[graft.functions.TokenQualityExpr]]); [[qualityScoreDeclarative]] is
    * the independently-derived same-result form, cross-checked in specs. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    graft.functions.TextFunctions.token_quality(text, stopwords)

  private[graft] def qualityScoreDeclarative(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokenize(text)
    val lenOk = when(size(toks).between(10, 100000), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(toks, stopwords).between(0.01, 0.8), 1.0).otherwise(0.0)
    val ttrOk = when(typeTokenRatio(toks) > 0.05, 1.0).otherwise(0.0)
    val cptOk = when(charsPerToken(text, toks).between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenOk + stopOk + ttrOk + cptOk) / 4.0
  }

  // ---- language ID ----------------------------------------------------

  /** Tiny per-language stopword profiles (top function words). Declaration
    * order is the tie-break priority, so this is a Seq, not a Map (Scala
    * HashMaps lose insertion order above 4 entries). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"))

  /** Stopword-profile language ID: argmax of per-language hit counts with a
    * fixed priority tie-break (profile declaration order). An n-gram
    * heuristic, not a model — adequate for routing/filtering at scale.
    * Native kernel ([[graft.functions.LangIdExpr]]); [[langIdDeclarative]]
    * is the cross-checked declarative form. */
  def langId(text: Column, profiles: Seq[(String, Seq[String])] = langProfiles): Column =
    graft.functions.TextFunctions.lang_id(text, profiles)

  private[graft] def langIdDeclarative(text: Column,
      profiles: Seq[(String, Seq[String])] = langProfiles): Column = {
    val toks = tokenizeRegex(text)
    val scores = profiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(x => x: Any): _*)))
    }
    // argmax via struct ordering: (score, priority) desc, then language
    val ranked = scores.zipWithIndex.map { case ((lang, s), i) =>
      struct(s.as("score"), lit(-i).as("prio"), lit(lang).as("lang"))
    }
    greatest(ranked: _*).getField("lang")
  }

  // ---- repetition / novelty -------------------------------------------

  /** Gopher-style repetition statistics struct (top-bigram fraction,
    * duplicate-trigram fraction, longest identical-token run) — native
    * one-pass kernel ([[graft.functions.RepetitionStatsExpr]]); the
    * relational same-result construction lives in the spec cross-check
    * and the q59 oracle. */
  def repetitionStats(text: Column): Column =
    graft.functions.TextFunctions.repetition_stats(text)

  /** Corpus-frequency novelty: per-document statistics of the document
    * frequency (number of docs containing the token) of its distinct
    * tokens — `n_distinct`, `mean_df`, `max_df`, and the hapax count
    * (tokens appearing in exactly one document). Rare-token-rich documents
    * (low mean_df, high hapax) are the novel tail a training mix wants to
    * keep; boilerplate scores high mean_df.
    *
    * Two shuffles at any scale: (doc, tok) → groupBy tok builds the
    * document-frequency table (vocabulary-sized — Zipf-bounded, orders of
    * magnitude smaller than the corpus), then the tok-keyed join back is
    * co-partitioned with it (the exchange on tok is shared), and one final
    * groupBy doc. Head tokens ("the") are the skew risk; AQE skew-join
    * splitting bounds them. */
  def tokenNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(tokenize(col(textCol)))).as("tok"))
    // (id, tok) pairs are distinct by construction → count(*) = doc freq
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(dfreq, Seq("tok"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(col("df")).as("df_sum"),
        max(col("df")).as("max_df"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("id"), col("n_distinct"),
        (col("df_sum").cast("double") / col("n_distinct")).as("mean_df"),
        col("max_df"), col("n_hapax"))
  }

  // ---- chunking -------------------------------------------------------

  /** Split documents into fixed-token sliding windows — the RAG/embedding
    * prep step (and the long-doc → training-sequence splitter): chunk k
    * covers tokens `[k·stride+1, k·stride+chunkTokens]` (1-based,
    * stride = chunkTokens − overlapTokens), the final chunk truncating at
    * the document end. Chunks start while `start ≤ n − overlap` so no
    * emitted chunk is wholly contained in its predecessor; docs shorter
    * than a chunk yield exactly one chunk; empty docs yield none.
    *
    * Distributed shape: tokenize → `sequence` → `explode` → `slice`, a
    * pure per-row projection — zero shuffles, no window, no join; output
    * size is input tokens × (1 + overlap/stride). Chunk identity
    * (idCol, chunk_idx) is positional, so the op is deterministic under
    * any partitioning and re-chunking a changed doc replaces exactly its
    * own chunks.
    *
    * Output: (idCol, chunk_idx, tok_start, chunk_len, chunk_text). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need chunkTokens > overlapTokens >= 0")
    val stride = (chunkTokens - overlapTokens).toLong
    val toks = filter(tokenize(col(textCol)), t => t =!= "")
    val start = (col("chunk_idx") * lit(stride) + lit(1L))
    df.select(col(idCol), toks.as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        floor(greatest(col("n_tok") - lit(overlapTokens.toLong + 1L), lit(0L))
          .cast("double") / lit(stride.toDouble)).cast("long"))))
      .select(col(idCol), col("chunk_idx"), start.as("tok_start"),
        least(lit(chunkTokens.toLong), col("n_tok") - start + lit(1L)).as("chunk_len"),
        array_join(slice(col("toks"), start.cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  // ---- fingerprinting -------------------------------------------------

  /** Order-sensitive document fingerprint: polynomial rolling hash over the
    * token stream, kept under 2^31 so the fold never overflows (ANSI mode
    * would throw). Two docs differing only in token order get different
    * fingerprints — unlike set-based MinHash. */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), lit(2147483647L)),
        lit(2147483647L)))

  /** Engine-portable fingerprint variant: token hash from the first 8 hex
    * chars of md5 (reproducible in any engine — the DuckDB oracle folds
    * the same nibbles with `list_reduce`), same polynomial combine.
    * Native kernel ([[graft.functions.FingerprintMd5Expr]]);
    * [[fingerprintMd5Declarative]] is the cross-checked HOF form. */
  def fingerprintMd5(toks: Column): Column =
    graft.functions.TextFunctions.fingerprint_md5(toks)

  private[graft] def fingerprintMd5Declarative(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => pmod(
        acc * lit(1000003L) +
          pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(2147483647L)),
        lit(2147483647L)))

  /** BPE pair induction: corpus-weighted counts of adjacent symbol pairs —
    * the statistic the first byte-pair-encoding merge maximizes (Sennrich
    * et al., ACL'16). Classic BPE pre-tokenizes on whitespace and appends
    * an end-of-word marker, so pairs never cross word boundaries; both
    * forms are emitted here (in-word char pairs + `last-char</w>`).
    *
    * Scale shape: the corpus is touched ONCE (word count shuffle); pair
    * generation runs on the DISTINCT-word table, which Heaps' law keeps
    * orders of magnitude smaller than the corpus, and the pair key space
    * is at most alphabet² + alphabet markers — the final aggregate is
    * KB-sized. A full BPE trainer is this statistic in a loop with a
    * vocab rewrite between rounds; the per-round cost is this one
    * vocab-local pass, never a corpus re-scan. */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val inner = words
      .filter(length(col("w")) >= 2)
      .select(col("wc"), col("w"),
        explode(expr("sequence(1, length(w) - 1)")).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"), col("wc"))
    val ends = words
      .select(concat(expr("substring(w, length(w), 1)"), lit("</w>")).as("pair"),
        col("wc"))
    inner.union(ends)
      .groupBy(col("pair")).agg(sum(col("wc")).as("n_occ"))
  }

  /** BPE learn + encode ([[bpePairCounts]] completed into a working
    * tokenizer): greedily learn `rounds` merges on the distinct-word
    * table, apply them, and report per-source fertility (tokens per
    * word). One corpus pass builds the weighted word table; every learn
    * round then runs on that vocabulary-sized table (driver receives ONE
    * argmax row per round — bounded by contract); the final encode is a
    * broadcast join of the ≤vocab-row symbol counts back to the corpus.
    *
    * Merge application is the standard greedy-left pass, spelled as a
    * position-indexed flatten (hit i emits the merged symbol, position
    * i+1 is consumed, everything else passes through). Self-pairs (a,a)
    * are excluded from merge candidates so hits can never overlap — the
    * property that makes the single-pass application exact on BOTH
    * engines (the oracle replays the same lead/lag construction).
    *
    * Output: (source, n_words, n_tokens, tokens_per_word_fp6, merges) —
    * `merges` carries the learned sequence, so the gate certifies the
    * training trajectory, not just the end statistics.
    */
  def bpeFertility(docs: DataFrame, rounds: Int): DataFrame = {
    val words0 = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .withColumn("syms", split(col("w"), ""))
    var words = words0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    for (_ <- 1 to rounds) {
      val best = words
        // single-symbol words carry no pairs (and sequence(0, -1) would
        // run DESCENDING and index out of bounds under ANSI)
        .filter(size(col("syms")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("cnt"))
        .filter(col("a") =!= col("b"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val aL = lit(a); val bL = lit(b)
        val applied = words.withColumn("syms",
          flatten(transform(sequence(lit(0), size(col("syms")) - 1), i => {
            val cur = element_at(col("syms"), (i + 1).cast("int"))
            // guards keep element_at in [1, n] under ANSI; && short-circuits
            val consumed = (i > 0) &&
              (element_at(col("syms"), i.cast("int")) === aL) && (cur === bL)
            val hit = (cur === aL) && (i < size(col("syms")) - 1) &&
              (element_at(col("syms"), (i + 2).cast("int")) === bL)
            when(consumed, array().cast("array<string>"))
              .when(hit, array(concat(aL, bL)))
              .otherwise(array(cur))
          })))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        applied.count() // materialize before unpersisting the parent
        words.unpersist()
        words = applied
      }
    }
    val mergeStr = merges.map { case (a, b) => s"$a+$b" }.mkString("|")
    val nSym = words.select(col("w"), size(col("syms")).cast("long").as("n_sym"))
    docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(nSym), Seq("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_tokens"),
        round(lit(1e6) * col("n_tokens") / col("n_words")).cast("long")
          .as("tokens_per_word_fp6"),
        lit(mergeStr).as("merges"))
  }

  /** Tokenizer vocabulary-coverage report per source: OOV rate against the
    * corpus top-`vocabSize` token vocabulary (cnt desc, token asc
    * tie-break) and chars-per-token fertility — the go/no-go check before
    * committing a tokenizer to a training corpus.
    *
    * Scale shape: the corpus shuffles ONCE to the (source, token)
    * aggregate; global token counts, the vocabulary cut, and the OOV sums
    * all derive from that aggregate (no second corpus scan), and the
    * vocabulary joins back broadcast. The top-cut sort runs on the
    * distinct-token table, which is vocabulary-sized, not corpus-sized.
    *
    * Output: (source, n_docs, n_tokens, n_oov, oov_rate_fp6,
    * chars_per_token_fp6). */
  def vocabCoverage(docs: DataFrame, vocabSize: Int): DataFrame = {
    val docStats = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text")).cast("long")).as("n_chars"))
    val srcTok = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = srcTok.groupBy(col("tok")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))
    val agg = srcTok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source")).agg(
        sum(col("c")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(0L)).as("n_oov"))
    docStats.join(agg, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_oov"),
        round(lit(1e6) * col("n_oov") / col("n_tokens")).cast("long")
          .as("oov_rate_fp6"),
        round(lit(1e6) * col("n_chars") / col("n_tokens")).cast("long")
          .as("chars_per_token_fp6"))
  }
}
