package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) operator: rows not dominated on a
  * (minimize `costCol`, maximize `gainCol`) pair — the classic
  * price/quality skyline query (Börzsönyi et al. 2001, "The Skyline
  * Operator"). b dominates a iff b.cost ≤ a.cost ∧ b.gain ≥ a.gain with at
  * least one strict; ties on BOTH coordinates survive together (neither
  * dominates).
  *
  * Shape: for the 2-D case the skyline is exactly the rows whose gain
  * equals the max gain at their cost AND strictly exceeds the running max
  * gain over all strictly-cheaper costs. The naive prefix-max needs a
  * GLOBAL ordering of distinct costs — a single-partition window that dies
  * at scale — so the scan is computed as a distributed two-level prefix
  * max (the textbook parallel-scan decomposition):
  *
  *  1. per-cost max gain (one hash shuffle — the only corpus-sized one);
  *  2. costs bucket by a caller-supplied monotone `bucketOf` expression;
  *     per-bucket maxima form a TINY table whose running strict-prefix max
  *     (the carry-in) is a one-partition window over #buckets rows;
  *  3. within each bucket, a window PARTITIONED BY bucket computes the
  *     in-bucket prefix max; the effective prefix max is
  *     greatest(carry-in, in-bucket) — no global sort ever happens.
  *
  * Determinism: comparisons only (no arithmetic) — exact on ints/decimals
  * and on any doubles both engines read from the same parquet.
  */
object Skyline {

  /** @param bucketOf monotone non-decreasing function of the cost column
    *                 (e.g. `floor(cost / width)`); bucket count should be
    *                 large enough that per-bucket cost cardinality is
    *                 shuffle-partition-sized, small enough that the carry
    *                 table fits one task (10³–10⁶ both fine)
    * @return input rows on the Pareto frontier, original columns preserved
    */
  def skyline2D(df: DataFrame, costCol: String, gainCol: String,
      bucketOf: Column => Column): DataFrame = {
    val cost = col(costCol)
    val perCost = df.groupBy(cost.as("sk_cost"))
      .agg(max(col(gainCol)).as("sk_max_gain"))
      .withColumn("sk_bucket", bucketOf(col("sk_cost")))
    // tiny per-bucket table: strict-prefix carry across buckets
    val perBucket = perCost.groupBy(col("sk_bucket"))
      .agg(max(col("sk_max_gain")).as("sk_bucket_max"))
    val wCarry = Window.orderBy(col("sk_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perBucket
      .withColumn("sk_carry", max(col("sk_bucket_max")).over(wCarry))
      .select(col("sk_bucket"), col("sk_carry"))
    // in-bucket strict-prefix max over costs; combine with the carry-in
    val wIn = Window.partitionBy(col("sk_bucket")).orderBy(col("sk_cost"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = perCost
      .join(broadcast(carry), Seq("sk_bucket"))
      .withColumn("sk_in_pref", max(col("sk_max_gain")).over(wIn))
      .select(col("sk_cost"), col("sk_max_gain"),
        greatest(
          coalesce(col("sk_carry"), col("sk_in_pref")),
          coalesce(col("sk_in_pref"), col("sk_carry"))).as("sk_pref"))
    df.join(pref, cost === col("sk_cost"))
      .filter(col(gainCol) === col("sk_max_gain") &&
        (col("sk_pref").isNull || col("sk_pref") < col(gainCol)))
      .drop("sk_cost", "sk_max_gain", "sk_pref")
  }
}
