package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §0 north-star: "salting for skew, AQE
  * for runtime re-plan"). AQE's skew-join splitting covers joins; these
  * helpers cover the two cases AQE does not:
  *  - a high-cardinality aggregate whose *distinct-value* work piles onto
  *    few keys ([[saltedDistinctAgg]]);
  *  - an explicit two-phase aggregate for algebraic functions when one
  *    group dominates ([[saltedSum]]).
  */
object Skew {

  /** Two-phase salted sum: groupBy (keys, salt) partial, then keys final.
    * The salt spreads one hot group over `buckets` reducers; the second
    * shuffle carries only `buckets` rows per group. Results are exact for
    * algebraic aggregates (sum/count/min/max). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("n_rows"))
  }

  /** Salted exact count-distinct: phase 1 dedups (keys, value) spread by a
    * hash-salt of the value, phase 2 counts — the distinct set for a hot
    * key is built across `buckets` reducers instead of one. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(valueCol)), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(countDistinct(col(valueCol)).as("__d"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__d")).as(s"n_distinct_$valueCol"))
  }

  /** Broadcast-salt the small side of a join against a skewed key set:
    * replicate each small-side row `buckets` times with a salt column, salt
    * the big side randomly-but-deterministically, join on (key, salt). Use
    * when AQE's post-hoc split is unavailable (e.g., streaming). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()),
        lit(buckets)))
    val saltedSmall = small.crossJoin(
      spark_salt_range(small, buckets))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  private def spark_salt_range(df: DataFrame, buckets: Int): DataFrame =
    df.sparkSession.range(buckets).select(col("id").cast("int").as("__salt"))
}
