package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation: the constant-memory path when
  * exact distinct/quantile state would blow up at 100 TB (an exact
  * count-distinct on a high-cardinality column shuffles every distinct
  * value; HLL++ shuffles a few KB per group). Not oracle-gated — sketch
  * implementations differ per engine — accuracy is asserted against exact
  * answers in the test suite.
  */
object Approx {

  /** HyperLogLog++ distinct count; `rsd` = target relative error. */
  def distinctCount(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Greenwald-Khanna approximate percentiles (constant memory). */
  def percentiles(c: Column, ps: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c, typedlit(ps), lit(accuracy))

  /** Per-group approximate profile of a column: n, distinct, p50/p90. */
  def profile(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        distinctCount(col(valueCol)).as("approx_distinct"),
        percentiles(col(valueCol), Seq(0.5, 0.9)).as("approx_p50_p90"))

  /** Misra-Gries heavy hitters over a string Dataset: at most `k` summary
    * entries regardless of stream length, with the DETERMINISTIC theorem
    * bounds (no randomness, unlike HLL/GK):
    *   - never overcounts: est(t) ≤ true(t);
    *   - undercounts by at most N/(k+1) — merges included (Agarwal et
    *     al., "Mergeable Summaries": the merge that sums two summaries
    *     then subtracts the (k+1)-th largest count keeps the combined
    *     error additive under any merge tree, which is exactly what a
    *     partial-aggregate shuffle does);
    *   - hence every token with true(t) > N/(k+1) is present.
    * The q63/q64 gates check those three facts against exact counts — the
    * bound is a theorem, so the gates are exact, not probabilistic.
    *
    * Returns the ≤ k (token, est) entries. Constant executor memory per
    * partial; the driver sees only the k-entry summary — the 100 TB
    * shape for "top sources/domains/tokens" dashboards where an exact
    * groupBy would shuffle the full vocabulary. Per-group form:
    * `df.groupBy(g).agg(TextFunctions.heavy_hitters(col, k))`. */
  def heavyHitters(items: org.apache.spark.sql.Dataset[String], k: Int): Map[String, Long] =
    heavyHittersWithCount(items, k)._1

  /** [[heavyHitters]] plus the EXACT item count, from the same single
    * pass — the sketch buffer carries n, so no separate count job. */
  def heavyHittersWithCount(items: org.apache.spark.sql.Dataset[String],
      k: Int): (Map[String, Long], Long) = {
    val row = items.toDF("item")
      .agg(graft.functions.TextFunctions.heavy_hitters(col("item"), k).as("hh"))
      .select(col("hh.items"), col("hh.n"))
      .head()
    (row.getMap[String, Long](0).toMap, row.getLong(1))
  }
}
