package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries summary state: ≤ `2k` resident counters plus the
  * exact processed-item count `n`. The classic per-item decrement walk
  * (O(k) on every non-resident item — the CPU trap flagged in round 6) is
  * replaced by the amortized batch form: insert unconditionally, and when
  * the map exceeds `2k` entries subtract the (k+1)-th largest count from
  * everything and drop the non-positives — the "Mergeable Summaries"
  * (Agarwal et al., PODS'12) merge step applied to a singleton. Each
  * compress removes ≥ (k+1)·pivot mass from a total of N inserted, so the
  * accumulated undercount stays ≤ N/(k+1) under ANY interleaving of
  * updates and merges — the same deterministic theorem as classic MG, at
  * amortized O(1) per item for any k.
  */
private[graft] final class MGState(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var n: Long = 0L

  def add(item: String): Unit = {
    counts.update(item, counts.getOrElse(item, 0L) + 1L)
    n += 1L
    if (counts.size > 2 * k) compact()
  }

  def mergeIn(other: MGState): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    n += other.n
    if (counts.size > 2 * k) compact()
  }

  /** Cut to ≤ k entries by subtracting the (k+1)-th largest count; only
    * entries strictly above the pivot survive (ties die), so at most k
    * remain. O(size) with size ≤ 2k+1; each call frees ≥ k slots, so the
    * amortized cost per insert is O(1). No-op when already ≤ k wide. */
  def compact(): Unit = if (counts.size > k) {
    val pivot = counts.values.toArray.sortBy(-_).apply(k)
    val dead = mutable.ArrayBuffer[String]()
    counts.keysIterator.foreach { t =>
      val c = counts(t) - pivot
      if (c <= 0) dead += t else counts.update(t, c)
    }
    dead.foreach(counts.remove)
  }
}

/** SQL/DataFrame-callable Misra-Gries heavy hitters: `graft_heavy_hitters
  * (col, k)` usable in any `GROUP BY` — `df.groupBy("source").agg(...)`
  * shuffles at most k (string, long) pairs per group per partial
  * regardless of input size, the 100 TB shape for "top tokens per
  * source/domain". Returns `struct(items: map<string,bigint>, n: bigint)`
  * where `n` is the EXACT processed count — so a caller gets the sketch
  * and the stream length in ONE pass (q63 previously paid a separate
  * count job for N).
  *
  * Deterministic theorem bounds (per group, any merge tree): no
  * overcounts; undercount ≤ n/(k+1); every item with true count >
  * n/(k+1) present. See [[MGState]] for why the amortized batch form
  * preserves them. Partials ship as a compact length-prefixed binary
  * buffer (round 6 shipped Java-serialized HashMaps).
  */
case class HeavyHittersSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGState] with UnaryLike[Expression] {

  require(k >= 1, s"graft_heavy_hitters: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters expects a string column, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("items", MapType(StringType, LongType, valueContainsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGState = new MGState(k)

  override def update(buffer: MGState, input: InternalRow): MGState = {
    val v = child.eval(input)
    // nulls don't count toward n — count(col) semantics
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGState, other: MGState): MGState = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MGState): Any = {
    buffer.compact()
    // deterministic layout: entries sorted by token
    val entries = buffer.counts.toArray.sortBy(_._1)
    val row = new GenericInternalRow(2)
    row.update(0, ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1)), entries.map(_._2)))
    row.update(1, buffer.n)
    row
  }

  override def serialize(buffer: MGState): Array[Byte] = {
    buffer.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeLong(buffer.n)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (t, c) =>
      val b = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val state = new MGState(in.readInt())
    state.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      state.counts.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HeavyHittersSketch =
    copy(child = newChild)

  override def prettyName: String = "graft_heavy_hitters"
}
