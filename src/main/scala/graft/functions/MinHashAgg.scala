package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY §7.3: "a small
  * `Aggregator[IN, BUF, OUT]` for signature union"): folds a stream of
  * shingle hashes into a k-wide minimum vector. Mergeable buffers make it
  * a proper distributive aggregate — partial signatures combine across
  * partitions with element-wise min, so the shuffle carries k longs per
  * group regardless of document size.
  *
  * Used as `ds.groupByKey(_.docId).agg(MinHashAgg(16).toColumn)` on a
  * Dataset of (docId, shingle); the DataFrame-level pipeline in
  * [[graft.ops.Dedup]] remains the md5/oracle-portable path.
  */
final case class MinHashAgg(numHashes: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      // per-seed hash: cheap splittable mix of the shingle's hash and seed
      val h = scramble(shingle.hashCode.toLong, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.javaSerialization[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** splitmix64-style finalizer over (hash, seed). */
  private def scramble(x0: Long, seed: Int): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L * (seed + 1)
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
