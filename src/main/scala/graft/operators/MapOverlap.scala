package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic partition-overlap runner — the reference's `map_overlap`
  * (`/root/reference/dask_expr/_expr.py:768-1019` MapOverlap /
  * CreateOverlappingPartitions): run a per-partition function that also
  * sees `before` trailing rows of the previous partition and `after`
  * leading rows of the next one.
  *
  * Spark-first design: range-partition on the order column (Spark's
  * RangePartitioner samples boundaries — the analogue of the
  * reference's division computation), tag each partition's edge rows,
  * ship copies one partition over with a plain union (no custom RDD
  * plumbing), then `groupByKey(dest).flatMapGroups` so each group is
  * exactly one logical partition plus its overlap. Only edge rows are
  * duplicated, so shuffle volume is data + 2·numPartitions·k rows.
  *
  * The built-in uses of map_overlap (diff/shift/rolling) are expressed
  * as window functions elsewhere; this operator is the escape hatch for
  * arbitrary neighborhood UDFs, mirroring §2.11 of SURVEY.md.
  *
  * Note: rows with equal order-key never straddle a partition boundary
  * (RangePartitioner keeps equal keys together), so overlap ownership
  * is unambiguous.
  */
object MapOverlap {

  /** @param fn (sortedBlock, ownStart, ownEndExclusive) => output rows;
    *           the block is sorted by `orderCol` and includes overlap
    *           rows outside [ownStart, ownEnd).
    */
  def mapOverlap(
      df: DataFrame,
      orderCol: String,
      before: Int,
      after: Int,
      outSchema: StructType,
      numPartitions: Int = 0)(
      fn: (IndexedSeq[Row], Int, Int) => Iterator[Row]): DataFrame = {

    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val ranged = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__graft_pid", spark_partition_id())

    // Edge rows get copied to the neighbor; tag -1 = before-overlap
    // (from the previous partition), 1 = after-overlap, 0 = owned.
    val wAsc = Window.partitionBy(col("__graft_pid")).orderBy(col(orderCol).asc)
    val wDesc = Window.partitionBy(col("__graft_pid")).orderBy(col(orderCol).desc)

    val own = ranged
      .withColumn("__graft_dest", col("__graft_pid"))
      .withColumn("__graft_tag", lit(0))
    val tails = ranged
      .withColumn("__graft_rn", row_number().over(wDesc))
      .filter(col("__graft_rn") <= before)
      .drop("__graft_rn")
      .withColumn("__graft_dest", col("__graft_pid") + 1)
      .withColumn("__graft_tag", lit(-1))
    val heads = ranged
      .withColumn("__graft_rn", row_number().over(wAsc))
      .filter(col("__graft_rn") <= after)
      .drop("__graft_rn")
      .withColumn("__graft_dest", col("__graft_pid") - 1)
      .withColumn("__graft_tag", lit(1))

    var all = own
    if (before > 0) all = all.unionByName(tails)
    if (after > 0) all = all.unionByName(heads)
    all = all.filter(col("__graft_dest") >= 0 && col("__graft_dest") < n)

    val taggedSchema = all.schema
    val destIdx = taggedSchema.fieldIndex("__graft_dest")
    val tagIdx = taggedSchema.fieldIndex("__graft_tag")
    val orderIdx = taggedSchema.fieldIndex(orderCol)
    val payloadIdx = df.schema.fieldNames.map(taggedSchema.fieldIndex)
    val ordering = orderingFor(taggedSchema.fields(orderIdx).dataType)

    implicit val outEnc = Encoders.row(outSchema)
    all.groupByKey(r => r.getInt(destIdx))(Encoders.scalaInt)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        // sort by order key; before-overlap keys are strictly smaller and
        // after-overlap strictly larger than owned keys, tag breaks ties
        java.util.Arrays.sort(rows, (a: Row, b: Row) => {
          val c = ordering.compare(a.get(orderIdx), b.get(orderIdx))
          if (c != 0) c else Integer.compare(a.getInt(tagIdx), b.getInt(tagIdx))
        })
        val ownStart = rows.indexWhere(_.getInt(tagIdx) == 0)
        val ownEnd = rows.lastIndexWhere(_.getInt(tagIdx) == 0) + 1
        if (ownStart < 0) Iterator.empty
        else {
          val payload: IndexedSeq[Row] = rows.toIndexedSeq
            .map(r => Row.fromSeq(payloadIdx.toIndexedSeq.map(r.get)))
          fn(payload, ownStart, ownEnd)
        }
      }
  }

  private def orderingFor(dt: DataType): Ordering[Any] = {
    val ord: Ordering[_] = dt match {
      case LongType => Ordering.Long
      case IntegerType => Ordering.Int
      case DoubleType => Ordering.Double.TotalOrdering
      case FloatType => Ordering.Float.TotalOrdering
      case StringType => Ordering.String
      // Timestamp.compareTo handles the millis/nanos split correctly;
      // reconstructing an epoch by hand double-counts the sub-second part.
      case TimestampType => Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[java.sql.Timestamp]())
      case DateType => Ordering.by((d: java.sql.Date) => d.getTime)
      case _ => throw new IllegalArgumentException(s"unsupported order column type $dt")
    }
    ord.asInstanceOf[Ordering[Any]]
  }
}
