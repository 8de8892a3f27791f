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
}
