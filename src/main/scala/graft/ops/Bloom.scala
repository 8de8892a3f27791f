package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** Explicit Bloom runtime filtering — the big-side scan-prune primitive
  * behind Spark's `InjectRuntimeFilter`, surfaced as a user-callable
  * operator for the ingest-dedup join shape the optimizer's injection
  * rule does not cover.
  *
  * The shape: incremental ingest deduplicates a SMALL batch against a
  * HUGE corpus with `batch ANTI JOIN corpus ON key`. The batch side
  * broadcasts nowhere (anti-join build side must be the right), so the
  * plain plan shuffles the corpus — 100 TB of movement to answer
  * questions about a few million rows. [[prunedAntiJoin]] first folds
  * the batch's keys into one Bloom filter (a single small binary,
  * built by Spark's native `BloomFilterAggregate`), then prunes the
  * corpus scan to rows whose key MIGHT be in the batch before any
  * shuffle: the filter rides into the scan stage as a scalar-subquery
  * `might_contain` predicate — exactly how AQE's injected runtime
  * filters execute. Bloom filters have NO false negatives, so every
  * corpus row sharing a key with the batch survives pruning and the
  * rewrite is a semantic identity (the q72 salting discipline: the
  * oracle hash-matches the plain anti-join); false positives only add
  * rows the anti-join then ignores. Corpus bytes after pruning is
  * O(|batch| · (1 + fpp)), independent of corpus size.
  */
object Bloom {

  /** Optimal Bloom bit count for `n` items at false-positive rate
    * `fpp` (the standard `-n·ln(fpp)/ln²2` sizing). */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, "need n > 0 and fpp in (0,1)")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** One-row frame holding the Bloom filter of `df`'s `keyCol` values
    * (column `bloom`, binary): a distributed partial-aggregate build —
    * each partition folds its keys locally, partials OR together.
    *
    * SIZING CLAMP: Spark's `BloomFilterAggregate` silently clamps its
    * item/bit arguments to `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems` (default 4M) and `.maxNumBits` (default 64M) — beyond
    * ~4M keys the filter would be under-sized and its fpp would degrade
    * toward 1, quietly defeating the pruning (correctness unaffected: no
    * false negatives either way). Since multi-million-row batches are
    * this module's stated use case, the build RAISES both session confs
    * to cover the requested size before constructing the aggregate —
    * and, because `BloomFilterAggregate` reads the clamp at EXECUTION
    * time, the aggregate is materialized eagerly here, inside the raised
    * window, with the prior conf values restored in a `finally`. The
    * session is left exactly as found (the clamps stay meaningful for
    * Spark's own `InjectRuntimeFilter` sizing), and nothing that later
    * resets the confs can silently under-size an already-built filter. */
  def buildFilterBytes(df: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val numBits = optimalNumBits(expectedItems, fpp)
    val spark = df.sparkSession
    val itemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsConf  = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prevItems = spark.conf.get(itemsConf)
    val prevBits = spark.conf.get(bitsConf)
    try {
      if (prevItems.toLong < expectedItems)
        spark.conf.set(itemsConf, expectedItems.toString)
      if (prevBits.toLong < numBits)
        spark.conf.set(bitsConf, numBits.toString)
      val agg = new BloomFilterAggregate(
        Bridge.expression(xxhash64(col(keyCol))),
        Bridge.expression(lit(expectedItems)),
        Bridge.expression(lit(numBits)))
      df.groupBy().agg(Bridge.column(agg.toAggregateExpression()).as("bloom"))
        .head().getAs[Array[Byte]](0)
    } finally {
      spark.conf.set(itemsConf, prevItems)
      spark.conf.set(bitsConf, prevBits)
    }
  }

  /** One-row frame holding the Bloom filter of `df`'s `keyCol` values
    * (column `bloom`, binary) — see [[buildFilterBytes]] for the build
    * and conf discipline. */
  def buildFilter(df: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): DataFrame = {
    val spark = df.sparkSession
    spark.range(1)
      .select(lit(buildFilterBytes(df, keyCol, expectedItems, fpp)).as("bloom"))
  }

  /** Predicate `might_contain(<bloom of filterDf's keys>, key)` with the
    * already-built filter embedded as a LITERAL — foldable, so it is
    * eligible for scan-stage evaluation on the probe side, and immune to
    * any later session-conf changes (the filter bytes are fixed at build
    * time, not re-derived at execution). */
  def mightContainKey(filterDf: DataFrame, keyCol: String, key: Column,
      expectedItems: Long, fpp: Double): Column = {
    val bytes = buildFilterBytes(filterDf, keyCol, expectedItems, fpp)
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bytes)),
      Bridge.expression(xxhash64(key))))
  }

  /** SQL-facing builder table (the TextFunctions discipline: one table
    * shared by [[registerSql]] and [[graft.GraftExtensions]] so the two
    * registration paths cannot drift): `graft_bloom_agg(xxhash64(k),
    * items, bits)` → binary filter; `graft_bloom_contains(filter,
    * xxhash64(k))` → boolean. The aggregate builder returns the BARE
    * `AggregateFunction` — the analyzer wraps it at resolution, which is
    * what makes `GROUP BY` forms legal in SQL.
    *
    * FOLDABLE-FILTER DISCIPLINE: Spark's `BloomFilterMightContain`
    * analyzes fine with a scalar-subquery filter child, but on that shape
    * its generated code fails Janino ("Expression java.lang.Long is not
    * an rvalue") and the whole projection silently falls back to
    * interpreted mode with only a WARN — a registered native kernel that
    * quietly de-optimizes. So the SQL surface REJECTS non-foldable filter
    * children at registration with a clear error instead: build the
    * filter first and embed it as a literal (Scala: [[mightContainKey]]
    * does exactly this; SQL: a binary literal `X'..'`), which is also the
    * only shape the scan stage can evaluate without a subquery barrier.
    * GraftExtensionsSpec pins both halves: the literal form runs with
    * `spark.sql.codegen.fallback=false` (a compile failure would throw,
    * not degrade), and the subquery form raises this AnalysisException. */
  private[graft] val sqlBuilders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_bloom_agg" -> { es =>
      // CLAMP GUARD (the same no-silent-degradation discipline as the
      // contains builder below): `BloomFilterAggregate` clamps its
      // item/bit arguments to the session's runtime-bloom maxima AT
      // EXECUTION — an under-sized filter stays correct (no false
      // negatives) but its fpp quietly degrades toward 1 and the
      // pruning it exists for evaporates. The Scala build
      // ([[buildFilterBytes]]) raises the confs around an eager build;
      // the SQL surface cannot do that on the caller's behalf, so a
      // request beyond the current clamps fails loudly with the fix
      // spelled out instead of degrading.
      def folded(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Option[Long] =
        if (!e.foldable) None
        else scala.util.Try(e.eval()).toOption.collect {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
        }
      val conf = org.apache.spark.sql.SparkSession.active.conf
      val itemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val bitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      def guard(requested: Option[Long], what: String, confKey: String): Unit =
        requested.foreach { n =>
          val max = conf.get(confKey).toLong
          if (n > max) throw new org.apache.spark.sql.AnalysisException(
            s"graft_bloom_agg: requested $n $what exceeds $confKey = $max " +
              "— BloomFilterAggregate would silently clamp and under-size " +
              "the filter (fpp degrades toward 1). Raise the conf, or " +
              "build via graft.ops.Bloom.buildFilter, which raises it " +
              "around an eager build and restores it",
            None, None, None, None, Map.empty[String, String],
            Array.empty[org.apache.spark.QueryContext])
        }
      guard(folded(es(1)), "items", itemsConf)
      guard(folded(es(2)), "bits", bitsConf)
      new BloomFilterAggregate(es(0), es(1), es(2))
    },
    "graft_bloom_contains" -> { es =>
      if (!es(0).foldable) throw new org.apache.spark.sql.AnalysisException(
        "graft_bloom_contains requires a foldable (constant) bloom-filter " +
          "argument: subqueries and columns fall back to interpreted " +
          "execution in Spark's codegen. Materialize the filter first and " +
          "pass it as a literal — graft.ops.Bloom.mightContainKey builds " +
          // .sql/.toString can throw on still-unresolved children at
          // function-resolution time; the class name is always safe
          s"that shape; got: ${es(0).getClass.getSimpleName}",
        None, None, None, None, Map.empty[String, String],
        Array.empty[org.apache.spark.QueryContext])
      BloomFilterMightContain(es(0), es(1))
    })

  /** Register the SQL names on a live session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }

  /** `batch ANTI JOIN corpus ON keyCol`, with the corpus scan pre-pruned
    * by the batch-key Bloom filter (no false negatives ⇒ identical
    * result to the plain anti-join; certified by the q86 oracle).
    *
    * @param expectedItems sizing hint: (approximate) batch key count
    * @param fpp           target false-positive rate for the pruning
    *                      filter (governs leftover corpus rows, not
    *                      correctness)
    */
  def prunedAntiJoin(batch: DataFrame, corpus: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = corpus.filter(
      mightContainKey(batch, keyCol, col(keyCol), expectedItems, fpp))
    batch.join(pruned.select(col(keyCol)), Seq(keyCol), "left_anti")
  }
}
