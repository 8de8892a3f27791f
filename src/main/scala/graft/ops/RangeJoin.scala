package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval join: `left ⋈ right ON key ∧ rightTime ∈
  * [leftTime − window, leftTime]`.
  *
  * A naive range join plans as a BroadcastNestedLoopJoin (or worse, a
  * cartesian) — O(|L|·|R|) per key. Bucketing both sides by
  * `floor(time / window)` turns it into an equi-join on (key, bucket):
  * every qualifying pair lands in the right row's bucket or the next one,
  * so the left side explodes to exactly 2 bucket keys and the join
  * shuffles on short (key, bucket) pairs — linear in data size, skew
  * bounded by per-key-per-window row counts. The exact range predicate is
  * re-applied after the equi-join (the bucket match is a superset).
  */
object RangeJoin {

  /** @param left  must contain `key` and µs-timestamp `leftTime`
    * @param right must contain `key` and µs-timestamp `rightTime`
    * @param windowSeconds interval length W: matches satisfy
    *   `leftTime − W ≤ rightTime ≤ leftTime`
    * @return inner-join rows: all left columns + all right columns
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, windowSeconds: Long): DataFrame = {
    val w = windowSeconds * 1000000L // µs
    val lBucket = expr(s"unix_micros($leftTime) div $w")
    val rBucket = expr(s"unix_micros($rightTime) div $w")
    // left probes its own bucket and the previous one
    val lExpanded = left
      .withColumn("__b", explode(array(lBucket - 1, lBucket)))
    val rBucketed = right.withColumn("__b", rBucket)
    lExpanded.join(rBucketed, Seq(key, "__b"))
      .filter(col(rightTime) >= col(leftTime) - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col(rightTime) <= col(leftTime))
      .drop("__b")
  }
}
