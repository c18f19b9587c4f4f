package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 generator table — the Spark-native analogue of the
  * reference's `FromMap` / `FromMapProjectable` (`io/io.py:218-386`): a
  * function over a sequence of inputs materialized as a table, with the
  * requested column set PUSHED INTO the generator so unrequested columns
  * are never computed, and sequence-range predicates pushed into
  * partition planning so filtered spans are never generated.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.MapSource")
  *     .option("rows", 100000).option("partitions", 32).load()
  * }}}
  *
  * Schema: seq BIGINT, key STRING, value DOUBLE, payload STRING. Every
  * value is md5-derived from the row sequence (same convention as
  * `Datasets.timeseries`), so an external engine can replay the exact
  * table for verification; `payload` is deliberately the expensive
  * column, making projection pushdown observable in cost (and counted in
  * tests via [[MapSource.payloadsComputed]]).
  */
class MapSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MapSource.FULL

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(4)
    new MapTable(rows, parts)
  }
}

object MapSource {
  val FULL: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Test observability: generator invocations of the expensive column
    * (meaningful in local mode where executors share the JVM). */
  val payloadsComputed = new AtomicLong(0)
  /** Test observability: total rows emitted by readers. */
  val rowsEmitted = new AtomicLong(0)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // The per-column generators; formulas replayable in any engine with
  // md5 + hex→int (mirrors of the DuckDB SQL in IoQueries.q_from_map_source).
  def keyOf(i: Long): String =
    "k" + (java.lang.Long.parseLong(md5Hex(s"k|$i").substring(0, 4), 16) % 10)
  def valueOf(i: Long): Double =
    java.lang.Long.parseLong(md5Hex(s"v|$i").substring(0, 8), 16) / 4294967296.0
  def payloadOf(i: Long): String = {
    payloadsComputed.incrementAndGet()
    md5Hex(s"p|$i") + md5Hex(s"q|$i")
  }
}

private[sources] class MapTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_map($rows)"
  override def schema(): StructType = MapSource.FULL
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MapScanBuilder(rows, parts)
}

/** Projection pushdown via SupportsPushDownRequiredColumns; seq-range
  * predicate pushdown via SupportsPushDownFilters → the generated span
  * is clamped BEFORE partition planning, the generator-source equivalent
  * of partition pruning. */
private[sources] class MapScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = MapSource.FULL
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThan("seq", _: Long) | GreaterThanOrEqual("seq", _: Long) |
           LessThan("seq", _: Long) | LessThanOrEqual("seq", _: Long) |
           EqualTo("seq", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("seq", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("seq", v: Long) => lo = math.max(lo, v)
      case LessThan("seq", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("seq", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("seq", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ours
    rest // Spark re-evaluates only these
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new MapScan(required, lo, math.max(lo, hi), parts)
}

private[sources] class MapScan(schema: StructType, lo: Long, hi: Long, parts: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_map range=[$lo,$hi) cols=${schema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val p = math.max(1, math.min(parts, n).toInt)
    (0 until p).map { i =>
      MapInputPartition(lo + n * i / p, lo + n * (i + 1) / p): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MapReaderFactory(schema.fieldNames)
}

private[sources] case class MapInputPartition(start: Long, end: Long) extends InputPartition

private[sources] class MapReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MapInputPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = {
        MapSource.rowsEmitted.incrementAndGet()
        // only the PRUNED columns are ever computed
        InternalRow.fromSeq(cols.toIndexedSeq.map {
          case "seq" => i
          case "key" => UTF8String.fromString(MapSource.keyOf(i))
          case "value" => MapSource.valueOf(i)
          case "payload" => UTF8String.fromString(MapSource.payloadOf(i))
        })
      }
      override def close(): Unit = ()
    }
  }
}
