package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Misra-Gries heavy-hitters aggregator: a ≤ `k`-entry frequency
  * summary with deterministic theorem bounds (see
  * [[graft.ops.Approx.heavyHitters]]). A proper mergeable aggregate:
  * partials combine by summing counters then subtracting the (k+1)-th
  * largest count — the "Mergeable Summaries" merge, which keeps the
  * total undercount ≤ N/(k+1) under ANY merge tree, i.e. under whatever
  * partial-aggregation shape the shuffle produces. The shuffle carries at
  * most k (string, long) pairs per partial regardless of input size.
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(k >= 1)

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
      item: String): mutable.HashMap[String, Long] = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // classic MG step: a non-resident item decrements every counter
        // (this item's implicit counter hits 0 and is discarded with them)
        val dead = mutable.ArrayBuffer[String]()
        buf.keysIterator.foreach { t =>
          val c = buf(t) - 1
          if (c == 0) dead += t else buf.update(t, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count; ≤ k strictly-larger entries
      // survive (ties with the pivot die), so the summary stays ≤ k wide
      val pivot = a.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer[String]()
      a.keysIterator.foreach { t =>
        val c = a(t) - pivot
        if (c <= 0) dead += t else a.update(t, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.javaSerialization[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
