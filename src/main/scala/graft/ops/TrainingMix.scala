package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Training-mix construction operators (north-star extension): the steps
  * between "curated corpus" and "batches on the trainer" —
  *
  *  - [[stratifiedSample]]: deterministic per-stratum Bernoulli sampling
  *    (language/source/quality mixes). No count pass, no shuffle: each row
  *    decides for itself from an md5-derived uniform, so the same command
  *    cuts the same mix on any cluster size — and the oracle can replay it.
  *  - [[packSequences]]: greedy contiguous packing of documents into
  *    fixed-token-budget training sequences, sharded so the running sum is
  *    a per-shard window (never a single global sort at 100 TB).
  *  - [[contamination]]: benchmark-overlap detection — distinct word
  *    n-grams of each corpus doc joined against the benchmark's n-gram
  *    set; one equi-join on the shingle, count per doc.
  */
object TrainingMix {

  /** Value of the first 8 hex chars of md5(s) as a long in [0, 2³²) —
    * a uniform engine-portable hash (same construction the MinHash and
    * sampling oracles replay in SQL). */
  private[graft] def hex8(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Keep each row iff hash(id) < rate(stratum)·2³² — deterministic
    * Bernoulli sampling per stratum, exact integer compare (no float
    * edge). Unknown strata fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    def threshold(rate: Double): Long = (rate * 4294967296.0).toLong
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(threshold(rate))).otherwise(acc)
    }
    df.filter(hex8(concat(col(idCol).cast("string"), lit("#smp"))) < thr)
  }

  /** Value of the first 13 hex chars of md5(s) as a long in [0, 2⁵²) —
    * enough uniform bits to feed a double mantissa exactly. */
  private[graft] def hex13(s: Column): Column =
    conv(substring(md5(s), 1, 13), 16, 10).cast("long")

  /** Deterministic weighted sample WITHOUT replacement — Efraimidis &
    * Spirakis 2006 ("Weighted random sampling with a reservoir"), the
    * A-ES one-pass scheme: each row draws u = uniform(id) and the k
    * LARGEST values of u^(1/w) are the sample, which is distribution-
    * exact for sampling-without-replacement proportional to w. The
    * trainer-side use is token-budget-fair subsampling: w = token count
    * samples documents proportional to their training contribution, not
    * one-doc-one-vote.
    *
    * Distributed shape: the draw is a pure projection (the md5-derived
    * uniform — no RNG state, so the same command cuts the same sample on
    * any cluster size, and the oracle replays it); top-k is per-partition
    * heaps (TakeOrderedAndProject), never a global sort.
    *
    * Determinism across engines: ranking uses ln(u)/w (monotone in
    * u^(1/w)) rounded to 1e-12 fixed-point — one `ln` + one division,
    * expression-identical in the oracle; the rounding absorbs the libm
    * ulp, and ties (astronomically thin) break by id.
    *
    * @param weightCol positive numeric weight (zero/negative rows are
    *                  excluded — they can never be sampled)
    * @return (rank, idCol, weightCol, key_fp12), rank 1..k by key desc
    */
  def weightedTopKSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val u = (hex13(concat(col(idCol).cast("string"), lit("#aes")))
      .cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val key = round((log(u) / col(weightCol)) * lit(1e12)).cast("long")
    val keyed = df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol), key.as("key_fp12"))
    val topk = keyed.orderBy(col("key_fp12").desc, col(idCol)).limit(k)
    topk.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("key_fp12").desc, col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col(weightCol), col("key_fp12"))
  }

  /** Reweight a corpus to a TARGET DOMAIN MIX under a token budget — the
    * "data mixing" step of pretraining-set construction (the Pile /
    * DoReMi-style source weighting, applied as sampling): source s gets
    * acceptance rate `min(1, budget·f_s / T_s)` where `f_s` is its
    * target fraction and `T_s` its total weight (tokens), then each row
    * decides for itself via the md5-derived uniform. Over-represented
    * sources are downsampled toward the target; under-represented ones
    * are kept whole (the clamp — sampling cannot mint tokens that do
    * not exist; upsampling is a trainer-side repeat).
    *
    * Distributed shape: one per-source aggregation (a handful of rows),
    * rates broadcast back, selection a pure filter projection — the
    * corpus itself is never shuffled. Deterministic: same command, same
    * mix, any cluster size; the oracle replays the draw exactly.
    *
    * @param targets   target fraction per stratum (sources absent from
    *                  the map fall back to `defaultFrac`)
    * @return the kept rows: (idCol, strataCol, weightCol)
    */
  def mixToBudget(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String, targets: Map[String, Double], defaultFrac: Double,
      budgetTokens: Long): DataFrame = {
    val frac = targets.foldLeft(lit(defaultFrac)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    val totals = df.groupBy(col(strataCol)).agg(sum(col(weightCol)).as("t_str"))
    val thr = totals.select(col(strataCol),
      floor(least(lit(1.0), (lit(budgetTokens) * frac) / col("t_str"))
        * lit(4294967296.0)).cast("long").as("thr"))
    df.join(broadcast(thr), Seq(strataCol))
      .filter(hex8(concat(col(idCol).cast("string"), lit("#mix"))) < col("thr"))
      .select(col(idCol), col(strataCol), col(weightCol))
  }

  /** Temperature-balanced source mixing (the multilingual/source
    * rebalancing step of XLM-R / mT5-style pipelines, public method):
    * per-source sampling mass ∝ n_s^α with α ∈ (0, 1], normalized to a
    * row budget — α < 1 flattens the source distribution, upsampling
    * the relative share of rare sources without ever repeating a row
    * (targets cap at n_s; every source keeps ≥ 1 row).
    *
    * Determinism (the Det discipline): n_s^α rounds to 6 decimals into
    * DECIMAL before the normalizing sum (order-free, engine-exact); the
    * final target is one double multiply+divide+round on those exact
    * inputs. Row selection within a source is the [[capPerStratum]]
    * hash-rank draw — uniform without replacement and reproducible at
    * any parallelism.
    *
    * Distributed shape: the per-source target table is driver-bounded
    * by SOURCE cardinality (the codebook argument — thousands, not
    * rows) and broadcasts; the window ranks with the LITERAL max target
    * so Spark's `WindowGroupLimit` still caps every partition before
    * the exchange, and the exact per-source filter applies after.
    *
    * @return (idCol, srcCol, rk, t_src): survivors with their in-source
    *         rank and the source's target
    */
  def temperatureMix(df: DataFrame, idCol: String, srcCol: String,
      alpha: Double, budgetRows: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(budgetRows > 0, "budgetRows must be positive")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_src"))
      .select(col(srcCol), col("n_src"),
        round(pow(col("n_src").cast("double"), lit(alpha)), 6)
          .cast("decimal(28,6)").as("p"))
    val tot = counts.agg(sum(col("p")).as("s"))
    val targets = counts.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_src"),
        least(col("n_src"), greatest(lit(1L),
          round(lit(budgetRows.toDouble) *
            (col("p").cast("double") / col("s").cast("double")))
            .cast("long"))).as("t_src"))
      .collect().map(r => (r.get(0), r.getLong(2)))
    val maxT = targets.map(_._2).max
    val spark = df.sparkSession
    import spark.implicits._
    val tDf = targets.map { case (s, t) => (String.valueOf(s), t) }
      .toSeq.toDF(srcCol, "t_src")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(hex8(concat(col(idCol).cast("string"), lit("#tmp"))), col(idCol))
    df.select(col(idCol), col(srcCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= lit(maxT)) // literal: WindowGroupLimit pushdown
      .join(broadcast(tDf), Seq(srcCol))
      .filter(col("rk") <= col("t_src"))
      .select(col(idCol), col(srcCol), col("rk"), col("t_src"))
  }

  /** Cap each stratum at `cap` rows — the per-domain/per-source cap of
    * web-corpus curation (no single domain may dominate the mix): rows
    * rank within their stratum by the md5-derived hash (tie-break id),
    * rank ≤ cap survives. Hash order makes the kept subset a uniform
    * without-replacement draw AND deterministic — same command, same
    * survivors, any cluster size — unlike "first cap seen", which
    * depends on scan order.
    *
    * Distributed shape: rank-then-filter compiles to Spark's
    * `WindowGroupLimit` pushdown — every input partition keeps ≤ cap
    * rows per stratum BEFORE the exchange, so a mega-domain ships at
    * most cap·partitions rows, never its full row count. PlanSpec gates
    * the pushdown; [[weightedTopKSample]] is the global-k sibling.
    *
    * @return the survivors: (idCol, strataCol, rk) with rk 1..cap
    */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hex8(concat(col(idCol).cast("string"), lit("#cap"))), col(idCol))
    df.select(col(idCol), col(strataCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }

  /** Deterministic train/validation/test split assignment — every
    * pipeline's last step before the trainer. Each row hashes itself
    * into [0, 2³²) and takes the label of the interval its hash lands
    * in, so the assignment is a pure projection: no RNG state, no
    * shuffle, no count pass; the same command labels the same rows on
    * any cluster size, a re-run after appending new documents never
    * relabels an old one (the property per-split random shuffles lose),
    * and holdout membership is decidable row-locally at serving time.
    * The hash is independent of any stratum column, so every stratum
    * receives the same expected fractions (stratified in expectation).
    *
    * Interval bounds are precomputed integer thresholds
    * (`splitThresholds`) compared exactly — no float edge; the oracle
    * inlines the identical longs.
    *
    * @param splits (label, fraction) in order; fractions must sum to 1
    *               (±1e-9). The last label absorbs the rounding sliver.
    * @return `df` plus a `split` label column
    */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    val u = hex8(concat(col(idCol).cast("string"), lit("#split")))
    val label = splitThresholds(splits).init.foldRight(
        lit(splits.last._1): Column) {
      case ((name, thr), acc) => when(u < thr, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Cumulative integer thresholds for [[assignSplits]] — shared with the
    * oracle SQL so both engines compare against bit-identical longs. */
  private[graft] def splitThresholds(
      splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "fractions must be positive")
    require(splits.map(_._1).distinct.size == splits.size,
      "split labels must be distinct")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.map(_._1).zip(cum.map(c => (c * 4294967296.0).toLong))
  }

  /** Curriculum phasing — bucket documents into ordered training phases
    * by corpus quantiles of a difficulty proxy (here any numeric
    * `keyCol`; token count and quality score are the usual choices):
    * phase 0 = below p25, 1 = [p25, p50), 2 = [p50, p75), 3 = top
    * quartile. Curriculum learning consumes phases in order
    * (easy→hard); emitting the phase as a COLUMN (not a sort) keeps the
    * corpus unsorted — the trainer reads phase partitions in sequence,
    * and no global sort ever runs.
    *
    * Distributed shape: one tiny exact-percentile aggregation (a
    * handful of doubles) broadcast back as a one-row cross join, then a
    * pure filter-free projection — the corpus is never shuffled. Exact
    * `percentile` (not the sketch) keeps the thresholds engine-portable:
    * both engines implement the same (n−1)·p interpolation, exact in
    * double for integer-valued keys (the q32 discipline) — a sketch
    * threshold would be merge-order-dependent and ungateable.
    *
    * NULL `keyCol` values are excluded from the percentiles (standard
    * aggregate semantics) and land in phase 3 via the `otherwise` —
    * callers wanting them elsewhere should filter or impute first.
    */
  def curriculumPhases(df: DataFrame, idCol: String,
      keyCol: String): DataFrame = {
    val qs = df.agg(
      expr(s"percentile($keyCol, 0.25)").as("p25"),
      expr(s"percentile($keyCol, 0.5)").as("p50"),
      expr(s"percentile($keyCol, 0.75)").as("p75"))
    val passthrough = df.columns.map(col)
    df.crossJoin(broadcast(qs))
      .withColumn("phase",
        when(col(keyCol) < col("p25"), 0L)
          .when(col(keyCol) < col("p50"), 1L)
          .when(col(keyCol) < col("p75"), 2L)
          .otherwise(3L))
      // every input column rides through: attaching the phase must not
      // force callers into a corpus-wide join-back to recover their own
      // columns (idCol stays in the signature as the API's identity
      // contract, matching the sibling operators)
      .select(passthrough :+ col("phase"): _*)
  }

  /** Assign each document a (shard, seq) training-sequence slot: documents
    * are hash-sharded, then packed in id order into sequences holding
    * `budgetTokens` tokens (a doc straddling the boundary stays in the
    * earlier sequence — greedy contiguous packing). The running sum is a
    * window per shard, so no global sort exists at any scale; `shards`
    * controls the parallelism of the packing itself.
    *
    * Output: (id, tokens, shard, seq, tok_start — offset of the doc's
    * first token within its shard's stream). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = size(TextOps.tokenize(col(textCol))).cast("long")
    val shard = pmod(hex8(concat(col(idCol).cast("string"), lit("#shard"))), lit(shards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id"), toks.as("tokens"), shard.as("shard"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .select(col("id"), col("tokens"), col("shard"),
        expr(s"(cum - tokens) div $budgetTokens").as("seq"),
        (col("cum") - col("tokens")).as("tok_start"))
  }

  /** Corpus docs sharing ≥1 distinct word `n`-gram with the benchmark set:
    * (id, n_shared). Shingle sets come from the native codegen'd kernel;
    * the join key is the shingle itself — one shuffle, then a per-doc
    * count. Docs with zero overlap don't appear (inner join). */
  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    def shingleRows(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.distinct_shingles(col(textCol), n)).as("sh"))
    val benchSet = shingleRows(bench).select(col("sh")).distinct()
    shingleRows(corpus).join(benchSet, Seq("sh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Length-bucketed inference/training batching: group docs into
    * homogeneous-length batches so a serving fleet pads each batch only to
    * its bucket cap, not the corpus max (the standard dynamic-batching
    * prep for batch embedding / scoring runs).
    *
    * Buckets are FIXED pow-2 token caps (32…`maxCap`) — a transcendental-
    * free CASE chain, engine-reproducible. Within a bucket, docs are
    * sharded by a deterministic md5 hash into `shards` independent
    * streams and batches of `batchSize` are cut per (bucket, shard) by
    * doc-id order. Batches only need homogeneous LENGTH, not a global
    * order, so sharding multiplies window parallelism by `shards` — the
    * same escape from the single-partition window q52 uses; at 100 TB,
    * raise `shards` so each (bucket, shard) stream fits one task.
    *
    * Output: (id, tokens, cap, shard, seq, slot, pad) — `seq` is the
    * batch index within (cap, shard), `slot` the position in its batch,
    * `pad` = cap − tokens the padding waste the bucketing saves vs a
    * corpus-max pad. */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int, shards: Int, maxCap: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val caps = Iterator.iterate(32)(_ * 2).takeWhile(_ < maxCap).toSeq
    val toks = size(TextOps.tokenize(col(textCol))).cast("long")
    val cap = caps.reverse.foldLeft(lit(maxCap.toLong)) {
      case (acc, c) => when(col("tokens") <= c, lit(c.toLong)).otherwise(acc)
    }
    val shard = pmod(hex8(concat(col(idCol).cast("string"), lit("#batch"))),
      lit(shards.toLong))
    val w = Window.partitionBy(col("cap"), col("shard")).orderBy(col("id"))
    df.select(col(idCol).as("id"), toks.as("tokens"), shard.as("shard"))
      .withColumn("cap", cap)
      .withColumn("rn", row_number().over(w).cast("long") - 1L)
      .select(col("id"), col("tokens"), col("cap"), col("shard"),
        expr(s"rn div $batchSize").as("seq"),
        pmod(col("rn"), lit(batchSize.toLong)).as("slot"),
        (col("cap") - col("tokens")).as("pad"))
  }
}
