package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the north-star composition of the
  * text/dedup operators into one declarative pipeline —
  *
  *   quality filter → language filter → exact dedup → MinHash near-dup
  *   removal → fingerprint stamp
  *
  * Every stage is a narrow transform or an equi-join/groupBy on hashes, so
  * the whole pipeline is 3 shuffles (exact-dedup hash, minhash buckets,
  * candidate grouping) regardless of corpus size; nothing is ever
  * collected, and each stage's reduction shrinks the data entering the
  * next.
  */
object Curation {

  final case class Config(
      minQuality: Double = 0.5,
      keepLangs: Seq[String] = Nil, // empty = keep all
      nearDupJaccard: Double = 0.8,
      stopwords: Seq[String] = TextOps.langProfiles.head._2,
      // stamp function over the token array; md5 variant for oracle parity
      fingerprint: Column => Column = TextOps.fingerprint)

  /** Returns the curated corpus: surviving rows of `docs` (idCol, textCol
    * intact) + `quality`, `pred_lang`, `fingerprint` columns. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    // 1-2: per-row scores, single pass, codegen'd
    val scored = docs
      .withColumn("quality", TextOps.qualityScore(col(textCol), cfg.stopwords))
      .withColumn("pred_lang", TextOps.langId(col(textCol)))
      .filter(col("quality") >= cfg.minQuality)
    val langFiltered =
      if (cfg.keepLangs.isEmpty) scored
      else scored.filter(col("pred_lang").isin(cfg.keepLangs.map(x => x: Any): _*))

    // 3: exact dedup (min-id representative per content hash). Cached AND
    // eagerly materialized: its lineage (scan + scoring + dedup window)
    // feeds SIX downstream stages — both sides of the signature self-join,
    // the verify semi-join, both verify pair-join sides, and the final
    // anti-join. A lazy persist would let those stages launch concurrently
    // against a not-yet-populated cache and EACH recompute the full lineage
    // (measured: ~70 s of duplicated CPU at sf0.1 — more than the whole
    // query). The count() barrier builds the cache once; every consumer
    // then reads columnar batches.
    val exact = Dedup.exact(langFiltered, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()

    // 4: near-dup removal — LSH candidates, verified Jaccard, drop the
    // higher id of each confirmed pair (keep-first policy). Candidates are
    // persisted: verifyJaccard consumes them twice (the candidate-doc
    // semi-join that prunes shingling, and the pair joins themselves) and
    // the pair set is tiny next to its signature-join lineage. Same eager
    // barrier: its two consumers launch as concurrent join stages.
    val cand = Dedup.minhashCandidates(exact, idCol, textCol)
      .select("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand.count()
    val confirmed = Dedup.verifyJaccard(exact, cand, idCol, textCol)
      .filter(col("jaccard") >= cfg.nearDupJaccard)
    // no distinct on losers: left_anti already collapses duplicate keys
    val losers = confirmed.select(col("id_b").as(idCol))
    val deduped = exact.join(losers, Seq(idCol), "left_anti")

    // 5: order-sensitive fingerprint for downstream exact tracking
    deduped.withColumn("fingerprint",
      cfg.fingerprint(TextOps.tokenize(col(textCol))))
  }

  /** Embedding-corpus near-dup removal: drop every vector whose verified
    * cosine to a lower-id candidate exceeds `threshold` (keep-first
    * policy).
    *
    * `method`:
    *  - `"lsh"` (default, the gated path): LSH-blocked candidate pairs +
    *    exact verify — equi-join on md5-portable signatures; the oracle
    *    gate replicates its signatures exactly.
    *  - `"lsh-minrep"`: bucket-min verification
    *    ([[Similarity.lshNearDupLosersMinRep]]) — the cluster-heavy-corpus
    *    shape, O(c·nTables) per duplicate cluster instead of O(c²) pair
    *    enumeration.
    *  - `"exact"`: O(n²) all-pairs baseline (test cross-checks only). */
  def curateEmbeddings(vectors: DataFrame, threshold: Double,
      method: String = "lsh"): DataFrame = {
    val losers = method match {
      case "exact" =>
        Similarity.nearDupPairs(vectors, threshold).select(col("id_b").as("id"))
      case "lsh" =>
        Similarity.lshNearDupCandidates(vectors, threshold = threshold)
          .select(col("id_b").as("id"))
      case "lsh-auto" =>
        // density-ruled signature width (Similarity.autoBits): the
        // scale-safe geometry — verify work stays linear in n where the
        // pinned width grows ~n²/2^bits. One count job up front.
        Similarity.lshNearDupCandidatesAuto(vectors, threshold = threshold)
          .select(col("id_b").as("id"))
      case "lsh-minrep" =>
        Similarity.lshNearDupLosersMinRep(vectors, threshold = threshold)
      case other => throw new IllegalArgumentException(
        s"unknown method '$other' (expected 'lsh', 'lsh-minrep', or 'exact')")
    }
    vectors.join(losers, Seq("id"), "left_anti")
  }
}
