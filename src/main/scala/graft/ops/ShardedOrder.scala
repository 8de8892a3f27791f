package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sharded replacements for single-ordering per-key windows — the one
  * plan shape that does NOT scale with cluster size: a window
  * `PARTITION BY key ORDER BY v` sorts each key's rows on ONE task, so a
  * low-cardinality key column (~10 event types at any SF) pins the whole
  * sort to ~10 cores no matter how many executors exist. Measured here
  * pre-fix: 4.7–8.4× time growth at 10× data while 22 of 32 cores idle
  * (SCALING_r12 note B).
  *
  * The remedy is the classic two-level decomposition, in two flavors:
  *
  * **Rank family** ([[shardedRowNumber]], [[shardedRank2]]): bucket each
  * key's rows into value RANGES (cut points from `percentile_approx`),
  * compute the window inside each (key, bucket) — parallelism becomes
  * keys × buckets — and restore global positions by adding the
  * bucket-count prefix offsets, a keys×buckets-sized second level.
  *
  * **Sequence family** ([[shardedGapStats]], [[shardedPrefixMax]]):
  * consecutive-row quantities (lag gaps, running max) split into
  * within-bucket parts plus one boundary term per bucket, merged at the
  * grid level.
  *
  * Correctness is INVARIANT to the cut points: any bucket assignment that
  * is (a) a pure function of the ordering value — so tied values never
  * straddle a boundary — and (b) monotone in it yields the identical
  * result, so the approximate quantiles only steer load balance, never
  * values. That is what lets the rewritten gates keep their UNCHANGED
  * plain-window DuckDB oracles: the substitution is a semantic identity,
  * certified by hash equality (the q72/q98 two-phase discipline).
  *
  * Scale shape: one corpus shuffle on (key, bucket) — same shuffle count
  * as the plain window, but 32× the parallel sort groups — plus a cheap
  * map-side-combined count/quantile aggregate and a broadcast of the
  * grid-sized offset table.
  */
object ShardedOrder {

  /** MAX shard count per key: the session's core count — enough to
    * engage the whole box at ~10 keys without grid bloat at 10k keys.
    * The EFFECTIVE count per key adapts downward from this ceiling in
    * [[withRangeBucket]] (≈ one bucket per [[targetRowsPerBucket]] rows):
    * r13 measured a flat cores-sized count costing the five sharded
    * gates +3.1 s of sf0.1 scheduling-floor constant that small keys
    * never repay — ~30% of each gate's time at 60k rows/key, while the
    * sf1 behavior (where keys are large enough to use every shard) is
    * unchanged. */
  private def defaultBuckets(df: DataFrame): Int =
    math.max(2, df.sparkSession.sparkContext.defaultParallelism)

  /** A shard under ~50k rows mostly buys scheduling overhead, not sort
    * parallelism: local sorts of ≤50k rows are sub-10ms, far below the
    * per-group window + broadcast-row constants they'd amortize. */
  private val targetRowsPerBucket = 50000L

  /** Adds `_so_bucket` with EXACTLY `nBuckets` per-key value ranges —
    * the non-adaptive form specs use to force boundary crossings on
    * tiny synthetics. Gates reach the adaptive [[rangeBucketed]] by
    * leaving `nBuckets` at its 0 default in the public methods. */
  def withRangeBucket(df: DataFrame, partCols: Seq[String], valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"withRangeBucket: need >= 2 buckets, got $nBuckets")
    rangeBucketed(df, partCols, valueCol, nBuckets)
  }

  /** Adds `_so_bucket`: which per-key value range holds this row. Cut
    * points are per-key approximate quantiles of `valueCol` at the
    * shard-count ceiling (explicit `nBuckets`, else the core count);
    * the raw bucket id is the count of cuts ≤ v. On the DEFAULT path
    * (`nBuckets < 2`) the raw id is then COALESCED per key to
    * `clamp(ceil(n_key / 50k), 2, ceiling)` effective buckets by
    * `floor(raw · eff / ceiling)` — small keys stop paying for shards
    * their sorts can't use (r13's +3.1 s sf0.1 constant), while keys
    * big enough to fill every shard still get them all. Everything
    * stays a monotone pure function of v (per-key grid constants
    * only), so ties never straddle a boundary and the library's
    * cut-invariance argument is untouched — the coalescing steers load
    * balance only. The per-key row count rides the SAME aggregate that
    * computes the cuts, so adaptivity costs zero extra jobs. The cuts
    * table is one grid-sized row per key, broadcast. */
  private def rangeBucketed(df: DataFrame, partCols: Seq[String],
      valueCol: String, nBuckets: Int): DataFrame = {
    val adaptive = nBuckets < 2
    val nb = if (adaptive) defaultBuckets(df) else nBuckets
    val probs = array((1 until nb)
      .map(i => lit(i.toDouble / nb)): _*)
    val eff =
      if (adaptive) least(greatest(
        ceil(col("_so_kn").cast("double") / targetRowsPerBucket.toDouble),
        lit(2L)), lit(nb.toLong))
      else lit(nb.toLong)
    // The coalescing SLICES the cut array in the keys-sized grid — cut k
    // of the effective set is raw cut ceil(k·nb/eff), so `count(coalesced
    // cuts ≤ v)` ≡ `floor(count(raw cuts ≤ v) · eff / nb)` — because the
    // per-ROW bucket probe is an interpreted higher-order filter over the
    // broadcast array: O(eff) per corpus row, not O(ceiling). Measured:
    // probing all 31 ceiling cuts per row was the actual cost of the flat
    // bucket count (~30% of each sharded gate at sf0.1), not the sort
    // groups themselves. With eff = nb the slice is the identity, so the
    // explicit-nBuckets path is byte-identical to the pre-adaptive form.
    val cuts = df.groupBy(partCols.map(col): _*)
      .agg(percentile_approx(col(valueCol), probs, lit(10000)).as("_so_cuts"),
        // non-null mass only: percentile_approx excludes NULL valueCol
        // rows from the cuts, so they must not inflate the bucket count
        // either (NULL rows all land in bucket 0 regardless — the filter
        // predicate is NULL — so extra buckets for them is pure drift)
        count(col(valueCol)).as("_so_kn"))
      .select((partCols.map(col) :+
        transform(sequence(lit(1L), eff - 1L),
          k => element_at(col("_so_cuts"),
            ceil(k.cast("double") * lit(nb.toDouble) / eff).cast("int")))
          .as("_so_ccuts")): _*)
    df.join(broadcast(cuts), partCols)
      .withColumn("_so_bucket",
        size(filter(col("_so_ccuts"), c => c <= col(valueCol))).cast("long"))
      .drop("_so_ccuts")
  }

  /** Global `row_number() OVER (PARTITION BY part ORDER BY value, ties)`
    * plus the per-key row count, computed at keys × buckets parallelism:
    * local row_number inside each (key, bucket) + the prefix sum of
    * bucket counts (grid-sized window, broadcast back). */
  def shardedRowNumber(df: DataFrame, partCols: Seq[String], valueCol: String,
      tieCols: Seq[String], rnCol: String, nCol: String,
      nBuckets: Int = 0): DataFrame = {
    val b = rangeBucketed(df, partCols, valueCol, nBuckets)
    val grp = (partCols :+ "_so_bucket").map(col)
    val wLoc = Window.partitionBy(grp: _*)
      .orderBy((valueCol +: tieCols).map(col): _*)
    val counts = b.groupBy(grp: _*).agg(count(lit(1)).as("_so_bc"))
    val wCum = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_so_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(partCols.map(col): _*)
    val offs = counts
      .withColumn("_so_off", coalesce(sum(col("_so_bc")).over(wCum), lit(0L)))
      .withColumn(nCol, sum(col("_so_bc")).over(wAll))
      .drop("_so_bc")
    b.withColumn("_so_lrn", row_number().over(wLoc).cast("long"))
      .join(broadcast(offs), partCols :+ "_so_bucket")
      .withColumn(rnCol, col("_so_off") + col("_so_lrn"))
      .drop("_so_off", "_so_lrn", "_so_bucket")
  }

  /** Global running sum `sum(inc) OVER (PARTITION BY part ORDER BY
    * orderCol, ties ROWS UNBOUNDED PRECEDING)` PLUS the global
    * row_number and the per-key row count, sharded: within-bucket
    * prefix sums at keys × buckets parallelism, then per-bucket (count,
    * inc-total) exclusive prefix offsets — a grid-sized window,
    * broadcast back — restore the global walk arithmetically. This is
    * the sequential-test / cumulative-LLR shape (q225): any per-key
    * corpus walk that is a running sum in event order. `tieCols` must
    * complete a total order within a key (row-frame semantics).
    *
    * Scale: one corpus shuffle on (key, bucket) — same count as the
    * plain window, at keys × buckets sort-group parallelism — plus the
    * map-side-combined bucket aggregate and the broadcast offsets. */
  def shardedPrefixSum(df: DataFrame, partCols: Seq[String], orderCol: String,
      tieCols: Seq[String], incCol: Column, cumCol: String, rnCol: String,
      nCol: String, nBuckets: Int = 0): DataFrame = {
    val b = rangeBucketed(df, partCols, orderCol, nBuckets)
      .withColumn("_so_inc", incCol)
    val grp = (partCols :+ "_so_bucket").map(col)
    val wLoc = Window.partitionBy(grp: _*)
      .orderBy((orderCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val counts = b.groupBy(grp: _*)
      .agg(count(lit(1)).as("_so_bc"), sum(col("_so_inc")).as("_so_bs"))
    val wCum = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_so_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(partCols.map(col): _*)
    val offs = counts
      .withColumn("_so_off", coalesce(sum(col("_so_bc")).over(wCum), lit(0L)))
      .withColumn("_so_soff", sum(col("_so_bs")).over(wCum))
      .withColumn(nCol, sum(col("_so_bc")).over(wAll))
      .drop("_so_bc", "_so_bs")
    b.withColumn("_so_lrn", row_number().over(wLoc).cast("long"))
      .withColumn("_so_lcs", sum(col("_so_inc")).over(wLoc))
      .join(broadcast(offs), partCols :+ "_so_bucket")
      .withColumn(rnCol, col("_so_off") + col("_so_lrn"))
      .withColumn(cumCol,
        col("_so_lcs") + coalesce(col("_so_soff"), lit(0L).cast("long")))
      .drop("_so_off", "_so_soff", "_so_lrn", "_so_lcs", "_so_inc",
        "_so_bucket")
  }

  /** The value at a per-key TARGET RANK of `ORDER BY value, ties` —
    * medians/quantiles by the cumulative-crossing rule — without ranking
    * any row outside the one bucket that contains the target: bucket
    * counts locate it (grid-sized), an inner broadcast join prunes the
    * corpus to ~n/buckets rows per key BEFORE the only window, and the
    * local row_number plus the bucket offset pins the exact row. This is
    * the cheap path when the consumer needs the crossing VALUE, not a
    * rank per row — [[shardedRowNumber]] costs a corpus-wide window +
    * join-back that a median never uses.
    *
    * @param rankOf 1-based target rank as a function of the per-key row
    *               count (e.g. `n => shiftright(n + 1, 1)` = ⌈n/2⌉, the
    *               lower median)
    * @return one row per key: partCols + `outCol` (the value at rank)
    */
  def shardedValueAtRank(df: DataFrame, partCols: Seq[String],
      valueCol: String, tieCols: Seq[String], rankOf: Column => Column,
      outCol: String, nBuckets: Int = 0): DataFrame = {
    val b = rangeBucketed(df, partCols, valueCol, nBuckets)
    val grp = (partCols :+ "_so_bucket").map(col)
    val counts = b.groupBy(grp: _*).agg(count(lit(1)).as("_so_bc"))
    val wCum = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_so_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(partCols.map(col): _*)
    val target = counts
      .withColumn("_so_off", coalesce(sum(col("_so_bc")).over(wCum), lit(0L)))
      .withColumn("_so_tr", rankOf(sum(col("_so_bc")).over(wAll)))
      .filter(col("_so_off") < col("_so_tr") &&
        col("_so_tr") <= col("_so_off") + col("_so_bc"))
      .drop("_so_bc")
    val wLoc = Window.partitionBy(grp: _*)
      .orderBy((valueCol +: tieCols).map(col): _*)
    b.join(broadcast(target), partCols :+ "_so_bucket")
      .withColumn("_so_lrn", row_number().over(wLoc).cast("long"))
      .filter(col("_so_off") + col("_so_lrn") === col("_so_tr"))
      .select((partCols.map(col) :+ col(valueCol).as(outCol)): _*)
  }

  /** The doubled average rank `2·rank + tie_size − 1` (the q194 integer
    * identity: rank() with average-rank tie handling, times two) under
    * `PARTITION BY part ORDER BY value`, sharded. Global rank = bucket
    * offset + local rank (valid because tied values share a bucket); the
    * tie count is a (key, bucket, value) window on the SAME exchange —
    * hashpartitioning(key, bucket) already clusters it. */
  def shardedRank2(df: DataFrame, partCols: Seq[String], valueCol: String,
      r2Col: String, nBuckets: Int = 0): DataFrame = {
    val b = rangeBucketed(df, partCols, valueCol, nBuckets)
    val grp = (partCols :+ "_so_bucket").map(col)
    val wLoc = Window.partitionBy(grp: _*).orderBy(col(valueCol))
    val wTie = Window.partitionBy(grp :+ col(valueCol): _*)
    val counts = b.groupBy(grp: _*).agg(count(lit(1)).as("_so_bc"))
    val wCum = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_so_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("_so_off", coalesce(sum(col("_so_bc")).over(wCum), lit(0L)))
      .drop("_so_bc")
    b.withColumn("_so_lrk", rank().over(wLoc).cast("long"))
      .withColumn("_so_tie", count(lit(1)).over(wTie))
      .join(broadcast(offs), partCols :+ "_so_bucket")
      .withColumn(r2Col,
        lit(2L) * (col("_so_off") + col("_so_lrk")) + col("_so_tie") - 1L)
      .drop("_so_off", "_so_lrk", "_so_tie", "_so_bucket")
  }

  /** Count + sum of `valueCol` over the rank RANGE `lo < rn ≤ hi` of
    * `ORDER BY value, ties` per key — trimmed sums/means — without
    * ranking the corpus at all: per-bucket (count, sum) aggregates and
    * the grid-sized offsets decide each bucket's fate arithmetically.
    * Buckets wholly inside the range contribute their SUM; only the ≤2
    * boundary buckets per key ever see a window, over ~n/buckets rows
    * pruned by an inner broadcast join before the exchange. `loOf`/
    * `hiOf` map the per-key row count to the (exclusive lo, inclusive
    * hi) rank cuts.
    *
    * @return one row per key: partCols + n, s_all, n_kept, s_kept
    */
  def shardedRangeSum(df: DataFrame, partCols: Seq[String], valueCol: String,
      tieCols: Seq[String], loOf: Column => Column, hiOf: Column => Column,
      nBuckets: Int = 0): DataFrame = {
    val b = rangeBucketed(df, partCols, valueCol, nBuckets)
    val grp = (partCols :+ "_so_bucket").map(col)
    val counts = b.groupBy(grp: _*)
      .agg(count(lit(1)).as("_so_bc"), sum(col(valueCol)).as("_so_bs"))
    val wCum = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_so_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(partCols.map(col): _*)
    val grid = counts
      .withColumn("_so_off", coalesce(sum(col("_so_bc")).over(wCum), lit(0L)))
      .withColumn("_so_n", sum(col("_so_bc")).over(wAll))
      .withColumn("_so_lo", loOf(col("_so_n")))
      .withColumn("_so_hi", hiOf(col("_so_n")))
      // grid-sized barrier: totals, interior, and boundary branches all
      // read it — un-barriered each re-runs the counts aggregate
      .localCheckpoint()
    val interior = grid
      .filter(col("_so_off") >= col("_so_lo") &&
        col("_so_off") + col("_so_bc") <= col("_so_hi"))
      .groupBy(partCols.map(col): _*)
      .agg(sum(col("_so_bs")).as("_so_s_int"))
    val boundary = grid
      .filter(col("_so_off") < col("_so_hi") &&
        col("_so_off") + col("_so_bc") > col("_so_lo") &&
        !(col("_so_off") >= col("_so_lo") &&
          col("_so_off") + col("_so_bc") <= col("_so_hi")))
      .select((partCols.map(col) :+ col("_so_bucket") :+ col("_so_off") :+
        col("_so_lo") :+ col("_so_hi")): _*)
    val wLoc = Window.partitionBy(grp: _*)
      .orderBy((valueCol +: tieCols).map(col): _*)
    val bSum = b.join(broadcast(boundary), partCols :+ "_so_bucket")
      .withColumn("_so_lrn", row_number().over(wLoc).cast("long"))
      .filter(col("_so_off") + col("_so_lrn") > col("_so_lo") &&
        col("_so_off") + col("_so_lrn") <= col("_so_hi"))
      .groupBy(partCols.map(col): _*)
      .agg(sum(col(valueCol)).as("_so_s_bnd"))
    grid.groupBy(partCols.map(col): _*)
      .agg(sum(col("_so_bc")).as("n"), sum(col("_so_bs")).as("s_all"),
        min(col("_so_lo")).as("_so_lo"), min(col("_so_hi")).as("_so_hi"))
      .join(interior, partCols, "left")
      .join(bSum, partCols, "left")
      .select((partCols.map(col) :+ col("n") :+ col("s_all") :+
        // clamp the cuts into [0, n] before differencing: a caller whose
        // hiOf exceeds the per-key row count (or loOf goes negative)
        // would otherwise get an n_kept larger than the rows actually
        // summed into s_kept (ADVICE r13)
        greatest(least(col("_so_hi"), col("n")) -
          greatest(col("_so_lo"), lit(0L)), lit(0L)).as("n_kept") :+
        (coalesce(col("_so_s_int"), lit(0L)) +
          coalesce(col("_so_s_bnd"), lit(0L))).as("s_kept")): _*)
  }

  /** Per-group sums of the doubled average rank — `Σ (2·rank + tie − 1)`
    * and row counts per (key, group) — without materializing a rank per
    * corpus row past its own bucket: the local window's contribution
    * aggregates per (key, bucket, group) on the SAME exchange, and the
    * global offset enters arithmetically (`+ 2·off·count`) at grid size.
    * This is the q194 shape: the consumer needs rank SUMS by arm, never
    * individual ranks. */
  def shardedRank2Sum(df: DataFrame, partCols: Seq[String], valueCol: String,
      grpCols: Seq[String], nBuckets: Int = 0): DataFrame = {
    val b = rangeBucketed(df, partCols, valueCol, nBuckets)
    val grp = (partCols :+ "_so_bucket").map(col)
    val wLoc = Window.partitionBy(grp: _*).orderBy(col(valueCol))
    val wTie = Window.partitionBy(grp :+ col(valueCol): _*)
    val perBucket = b
      .withColumn("_so_lrk", rank().over(wLoc).cast("long"))
      .withColumn("_so_tie", count(lit(1)).over(wTie))
      .groupBy((grp ++ grpCols.map(col)): _*)
      .agg(count(lit(1)).as("_so_gc"),
        sum(lit(2L) * col("_so_lrk") + col("_so_tie") - 1L).as("_so_gs"))
    val counts = b.groupBy(grp: _*).agg(count(lit(1)).as("_so_bc"))
    val wCum = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_so_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("_so_off", coalesce(sum(col("_so_bc")).over(wCum), lit(0L)))
      .drop("_so_bc")
    perBucket.join(broadcast(offs), partCols :+ "_so_bucket")
      .groupBy((partCols ++ grpCols).map(col): _*)
      .agg(sum(col("_so_gc")).as("n"),
        sum(col("_so_gs") + lit(2L) * col("_so_off") * col("_so_gc"))
          .as("r2_sum"))
  }

  /** Inter-arrival gap moments per key — `(n_gaps, sum gap, sum gap²)`
    * over gaps between consecutive rows in `(usCol, tieCol)` order —
    * WITHOUT a per-key total sort: within-bucket gaps come from a
    * (key, bucket) lag window; the one gap that crosses each bucket
    * boundary is `min_us(bucket) − max_us(previous bucket)`, a grid-sized
    * second-level window (bucket ranges are value-disjoint, so boundary
    * gaps never depend on the tie-break). Σgap² accumulates in
    * Decimal(38,0) — the q175 128-bit discipline. Keys with a single row
    * have no gaps and are dropped, matching the plain-window form. */
  def shardedGapStats(df: DataFrame, partCols: Seq[String], usCol: String,
      tieCol: String, nBuckets: Int = 0): DataFrame = {
    val b = rangeBucketed(df, partCols, usCol, nBuckets)
    val grp = (partCols :+ "_so_bucket").map(col)
    val wLoc = Window.partitionBy(grp: _*).orderBy(col(usCol), col(tieCol))
    val perBucket = b
      .withColumn("_so_gap", col(usCol) - lag(col(usCol), 1).over(wLoc))
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("_so_n"),
        sum(col("_so_gap")).as("_so_s"),
        sum(col("_so_gap").cast(DecimalType(19, 0)) * col("_so_gap"))
          .as("_so_ss"),
        min(col(usCol)).as("_so_min"), max(col(usCol)).as("_so_max"))
    val wB = Window.partitionBy(partCols.map(col): _*).orderBy(col("_so_bucket"))
    perBucket
      .withColumn("_so_bgap", col("_so_min") - lag(col("_so_max"), 1).over(wB))
      .groupBy(partCols.map(col): _*)
      .agg((sum(col("_so_n")) - 1L).as("n_gaps"),
        (coalesce(sum(col("_so_s")), lit(0L)) +
          coalesce(sum(col("_so_bgap")), lit(0L))).as("s"),
        (coalesce(sum(col("_so_ss")), lit(0L).cast(DecimalType(19, 0))) +
          coalesce(sum(col("_so_bgap").cast(DecimalType(19, 0))
            * col("_so_bgap")), lit(0L).cast(DecimalType(19, 0)))).as("ss"))
      .filter(col("n_gaps") > 0)
  }

  /** `max(valueCol) OVER (PARTITION BY part ORDER BY arrivalCol ROWS
    * UNBOUNDED PRECEDING .. 1 PRECEDING)` — the running "best so far,
    * excluding me" — sharded: within-bucket prefix max, plus the max over
    * all EARLIER buckets (grid-sized window, broadcast back), combined
    * with `greatest` (null-skipping, so the very first row per key stays
    * null exactly like the plain window). `arrivalCol` must be unique per
    * key (row-frame semantics). */
  def shardedPrefixMax(df: DataFrame, partCols: Seq[String],
      arrivalCol: String, valueCol: Column, outCol: String,
      nBuckets: Int = 0): DataFrame = {
    val b = rangeBucketed(df, partCols, arrivalCol, nBuckets)
      .withColumn("_so_v", valueCol)
    val grp = (partCols :+ "_so_bucket").map(col)
    val wLoc = Window.partitionBy(grp: _*).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perBucket = b.groupBy(grp: _*).agg(max(col("_so_v")).as("_so_bm"))
    val wB = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_so_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = perBucket
      .withColumn("_so_pm_prev", max(col("_so_bm")).over(wB))
      .drop("_so_bm")
    b.withColumn("_so_lpm", max(col("_so_v")).over(wLoc))
      .join(broadcast(offs), partCols :+ "_so_bucket")
      .withColumn(outCol, greatest(col("_so_lpm"), col("_so_pm_prev")))
      .drop("_so_lpm", "_so_pm_prev", "_so_bucket", "_so_v")
  }
}
