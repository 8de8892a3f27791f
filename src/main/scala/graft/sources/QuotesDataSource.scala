package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataTypes, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 for the reference's quote API corpus (S1,
  * `API_manager.py:119-129`): reads EVERY `eod/<TICKER>.json` response body
  * under the configured directory as one DataFrame with the ticker
  * attached — the whole-market view the reference assembles with a Python
  * loop over per-ticker calls, expressed as a single distributed scan.
  *
  * Demonstrates the source tier of the extension surface (SURVEY §7.3):
  *  - one `InputPartition` per ticker file → the scan parallelizes across
  *    executors and scales with the symbol universe;
  *  - `ticker` equality/IN predicates prune FILES before any I/O (the
  *    source-side analog of partition pruning);
  *  - `date` comparisons are applied during parsing (the `from=` API
  *    parameter of the reference, P8) so non-qualifying rows never reach
  *    Spark;
  *  - column pruning narrows the emitted rows to the read schema.
  *
  * Usage: `spark.read.format("graft-quotes").load(dir)` (registered via
  * DataSourceRegister) or `.format(classOf[QuotesDataSource].getName)`.
  */
class QuotesDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-quotes"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QuotesDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QuotesTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("graft-quotes requires a path")))
}

object QuotesDataSource {
  /** ticker + the raw EOD payload columns (`Schemas.eodRaw`). */
  val schema: StructType = new StructType()
    .add("ticker", DataTypes.StringType)
    .add("date", DataTypes.StringType)
    .add("open", DataTypes.DoubleType)
    .add("high", DataTypes.DoubleType)
    .add("low", DataTypes.DoubleType)
    .add("close", DataTypes.DoubleType)
    .add("adjusted_close", DataTypes.DoubleType)
    .add("volume", DataTypes.LongType)
}

final class QuotesTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-quotes($dir)"
  override def schema(): StructType = QuotesDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new QuotesScanBuilder(dir)
}

final class QuotesScanBuilder(dir: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = QuotesDataSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("ticker", _) | In("ticker", _) => true
      case EqualTo("date", _) | GreaterThan("date", _) |
           GreaterThanOrEqual("date", _) | LessThan("date", _) |
           LessThanOrEqual("date", _) => true
      case _ => false
    }
    // conservative contract: report everything as residual so Spark
    // re-applies the predicates above the scan — pruning is a performance
    // path here, never a correctness dependency
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new QuotesScan(dir, pushed, required)
}

final case class QuoteFilePartition(path: String, ticker: String)
  extends InputPartition

final class QuotesScan(dir: String, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-quotes $dir, PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.simpleString}"

  /** One partition per ticker file; ticker predicates prune the listing
    * itself, so a one-ticker query opens one file no matter how wide the
    * symbol universe is. */
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val fs = graft.core.Fs.fileSystem(spark, dir)
    val keep: String => Boolean = pushed.collectFirst {
      case EqualTo("ticker", v) => (t: String) => t == String.valueOf(v)
      case In("ticker", vs) =>
        val set = vs.map(String.valueOf).toSet
        (t: String) => set.contains(t)
    }.getOrElse((_: String) => true)
    // globStatus returns null (not empty) when the parent dir is missing
    val listed = Option(fs.globStatus(new Path(s"$dir/eod/*.json")))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-quotes: no eod/ directory under $dir"))
    listed.toSeq
      .map(_.getPath)
      .map(p => QuoteFilePartition(p.toString, p.getName.stripSuffix(".json")))
      .filter(p => keep(p.ticker))
      .sortBy(_.ticker)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new QuotesReaderFactory(conf, pushed, required)
  }
}

final class QuotesReaderFactory(conf: SerializableConfiguration,
    pushed: Array[Filter], required: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QuoteFilePartition]
    new QuotesPartitionReader(p, conf, pushed, required)
  }
}

/** Parses one response body and emits pruned rows; `date` predicates are
  * evaluated on the raw string (ISO dates compare lexicographically). */
final class QuotesPartitionReader(part: QuoteFilePartition,
    conf: SerializableConfiguration, pushed: Array[Filter],
    required: StructType) extends PartitionReader[InternalRow] {

  private val datePreds = pushed.collect {
    case EqualTo("date", v) => (d: String) => d == String.valueOf(v)
    case GreaterThan("date", v) => (d: String) => d > String.valueOf(v)
    case GreaterThanOrEqual("date", v) => (d: String) => d >= String.valueOf(v)
    case LessThan("date", v) => (d: String) => d < String.valueOf(v)
    case LessThanOrEqual("date", v) => (d: String) => d <= String.valueOf(v)
  }

  /** SQL comparison semantics: a null date fails every predicate but
    * passes an unfiltered scan (the schema declares date nullable). */
  private def dateOk(d: String): Boolean =
    if (d == null) datePreds.isEmpty else datePreds.forall(_(d))

  private val rows: Iterator[InternalRow] = {
    val fs = new Path(part.path).getFileSystem(conf.value)
    val in = fs.open(new Path(part.path))
    val tree = try new ObjectMapper().readTree(in) finally in.close()
    val fields = required.fieldNames
    tree.elements().asScala
      .filter(n => dateOk(if (n.hasNonNull("date")) n.get("date").asText() else null))
      .map { n =>
        val vals = fields.map {
          case "ticker" => UTF8String.fromString(part.ticker)
          case f =>
            val v = n.get(f)
            if (v == null || v.isNull) null
            else f match {
              case "date" => UTF8String.fromString(v.asText())
              case "volume" => java.lang.Long.valueOf(v.asLong())
              case _ => java.lang.Double.valueOf(v.asDouble())
            }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]]): InternalRow
      }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
