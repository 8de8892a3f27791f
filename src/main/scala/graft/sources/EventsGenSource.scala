package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{DataTypes, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 micro-batch STREAMING source (plus the matching batch
  * scan): a deterministic clickstream generator in the shape of the
  * `events` corpus table. Demonstrates the streaming tier of the source
  * extension surface (SURVEY §7.3) end to end — custom `Offset`, replay
  * from a checkpoint, range-partitioned distributed generation:
  *
  *  - row `i` of the stream is a pure function of (seed, i): generation is
  *    distributed across `partitions` readers by index range, the driver
  *    never materializes a row, and any offset range replays identically —
  *    exactly the property Structured Streaming's WAL recovery contract
  *    requires from a source;
  *  - offsets are plain row counts ([[EventsGenOffset]]); each trigger
  *    admits `rows_per_batch` more rows until `total_rows`;
  *  - the batch scan generates the IDENTICAL rows, so specs can assert
  *    stream(∪ batches) == batch — the effectively-once evidence.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-events-gen")
  *     .option("rows_per_batch", 500).option("total_rows", 5000).load()
  *   spark.read.format("graft-events-gen").option("total_rows", 5000).load()
  * }}}
  */
class EventsGenSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-events-gen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsGenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventsGenTable(EventsGenConfig(new CaseInsensitiveStringMap(properties)))
}

object EventsGenSource {
  val schema: StructType = new StructType()
    .add("event_id", DataTypes.LongType, false)
    .add("user_id", DataTypes.LongType, false)
    .add("ts", DataTypes.TimestampType, false)
    .add("event_type", DataTypes.StringType, false)
    .add("amount", DataTypes.DoubleType, false)

  val eventTypes: Array[String] = Array("view", "click", "cart", "purchase")

  /** splitmix64: the standard 64-bit finalizer — one multiply-xor chain per
    * field keeps generation branch-free and identical everywhere. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

final case class EventsGenConfig(
    rowsPerBatch: Long, totalRows: Long, partitions: Int, seed: Long,
    users: Long, baseTsMicros: Long, stepMicros: Long) {
  // rows_per_batch <= 0 would make the stream permanently idle (every
  // latestOffset == start) with no error anywhere — fail at build instead
  require(rowsPerBatch > 0, s"rows_per_batch must be > 0, got $rowsPerBatch")
  require(totalRows >= 0, s"total_rows must be >= 0, got $totalRows")
  require(users > 0, s"users must be > 0, got $users")
}

object EventsGenConfig {
  def apply(o: CaseInsensitiveStringMap): EventsGenConfig = EventsGenConfig(
    rowsPerBatch = o.getLong("rows_per_batch", 1000L),
    totalRows = o.getLong("total_rows", 10000L),
    partitions = o.getInt("partitions", 4),
    seed = o.getLong("seed", 42L),
    users = o.getLong("users", 100L),
    // 2024-01-01 00:00:00 UTC
    baseTsMicros = o.getLong("base_ts_micros", 1704067200000000L),
    stepMicros = o.getLong("step_micros", 1000000L))
}

final class EventsGenTable(cfg: EventsGenConfig) extends Table with SupportsRead {
  override def name(): String = s"graft-events-gen(${cfg.totalRows})"
  override def schema(): StructType = EventsGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new EventsGenScan(cfg) }
}

final case class EventsGenRange(lo: Long, hi: Long) extends InputPartition

final class EventsGenScan(cfg: EventsGenConfig) extends Scan with Batch {
  override def readSchema(): StructType = EventsGenSource.schema
  override def description(): String = s"graft-events-gen ${cfg.totalRows} rows"

  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    EventsGenScan.splitRange(0L, cfg.totalRows, cfg.partitions)
  override def createReaderFactory(): PartitionReaderFactory =
    new EventsGenReaderFactory(cfg)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventsGenStream(cfg)
}

object EventsGenScan {
  /** Contiguous near-equal index ranges — each reader generates its range
    * independently, so a batch of R rows is R/partitions work per task
    * with zero coordination. */
  def splitRange(lo: Long, hi: Long, parts: Int): Array[InputPartition] = {
    val n = math.max(1, parts)
    val total = math.max(0L, hi - lo)
    (0 until n).iterator
      .map { i =>
        val a = lo + i * total / n
        val b = lo + (i + 1) * total / n
        EventsGenRange(a, b)
      }
      .filter(r => r.hi > r.lo)
      .toArray[InputPartition]
  }
}

/** Row-count offset; `json` is just the count (monotone, human-readable in
  * the checkpoint's offset log). */
final case class EventsGenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Micro-batch admission via [[SupportsAdmissionControl]]: each trigger
  * admits `rows_per_batch` more rows past the engine-supplied START offset
  * (capped at `total_rows`), emulating a steadily producing upstream. The
  * source keeps NO availability state of its own — the engine's offset log
  * is authoritative — so a query restarted from a checkpoint resumes at
  * its committed offset instead of replaying from zero (the plain
  * `latestOffset()` has no start argument, which is exactly why a
  * restart-correct paced source must take this interface; the engine never
  * calls the no-arg form once it is implemented). */
final class EventsGenStream(cfg: EventsGenConfig) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  /** Under Trigger.AvailableNow the engine would otherwise snapshot ONE
    * `latestOffset` poll and stop after a single paced batch. Implementing
    * this interface tells it to keep polling batches until the source
    * stops advancing — our endpoint is already fixed (`total_rows`), so
    * there is nothing to prepare. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  private def n(o: Offset): Long = o match {
    case EventsGenOffset(v) => v
    case other => other.json().trim.toLong
  }

  override def initialOffset(): Offset = EventsGenOffset(0L)

  override def deserializeOffset(json: String): Offset =
    EventsGenOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The engine-supplied `limit` is INTENTIONALLY ignored: this source's
    * pacing contract is "exactly `rows_per_batch` rows per trigger" —
    * `rows_per_batch` IS the read limit, configured at the source, and a
    * generator has no lag for maxOffsetsPerTrigger-style hints to bound.
    * (`getDefaultReadLimit` stays `allAvailable()` accordingly.) */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    EventsGenOffset(math.min(n(start) + cfg.rowsPerBatch, cfg.totalRows))

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "paced source: the engine must use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    EventsGenScan.splitRange(n(start), n(end), cfg.partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new EventsGenReaderFactory(cfg)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

final class EventsGenReaderFactory(cfg: EventsGenConfig)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[EventsGenRange]
    new EventsGenPartitionReader(r.lo, r.hi, cfg)
  }
}

/** Generates rows `[lo, hi)`: every field is a splitmix64 mix of
  * (seed, index, field-tag) — O(1) state, no I/O, identical on replay. */
final class EventsGenPartitionReader(lo: Long, hi: Long, cfg: EventsGenConfig)
  extends PartitionReader[InternalRow] {

  import EventsGenSource.{eventTypes, mix}

  private var i = lo - 1
  private val types = eventTypes.map(UTF8String.fromString)

  override def next(): Boolean = { i += 1; i < hi }

  override def get(): InternalRow = {
    val base = mix(cfg.seed) ^ i
    val user = java.lang.Math.floorMod(mix(base ^ 0x1L), cfg.users)
    val typ = java.lang.Math.floorMod(mix(base ^ 0x2L), types.length.toLong).toInt
    val cents = java.lang.Math.floorMod(mix(base ^ 0x3L), 1000000L)
    new GenericInternalRow(Array[Any](
      i,                                    // event_id
      user,                                 // user_id
      cfg.baseTsMicros + i * cfg.stepMicros, // ts (micros)
      types(typ),                           // event_type
      cents / 100.0))                       // amount
  }

  override def close(): Unit = ()
}
