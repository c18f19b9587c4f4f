package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  * reference's division computation) and sort within partitions; then
  * a lightweight first job extracts only each partition's edge rows
  * (≤ before + after per partition), which are broadcast back so the
  * main pass is a single `mapPartitionsWithIndex` over data that is
  * already sorted — the bulk rows are shuffled exactly once and never
  * re-sorted or re-grouped.
  *
  * Driver traffic is bounded by numPartitions × (before + after) rows
  * (the same order as AsOfJoin's global min/max), so the design holds
  * at thousand-partition scale.
  *
  * The built-in uses of map_overlap (diff/shift/rolling) are expressed
  * as window functions elsewhere; this operator is the escape hatch for
  * arbitrary neighborhood UDFs, mirroring §2.11 of SURVEY.md.
  *
  * Note: rows with equal order-key never straddle a partition boundary
  * (RangePartitioner keeps equal keys together), so overlap ownership
  * is unambiguous. A partition's overlap comes from its immediate
  * neighbors only — `before`/`after` must not exceed a typical
  * partition's row count (same contract as the reference).
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
    val rdd = ranged.rdd

    // Job 1: per-partition edge rows only — first `after` rows (overlap
    // for the previous partition) and last `before` rows (for the next).
    val edges: Map[Int, (Array[Row], Array[Row])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val head = new scala.collection.mutable.ArrayBuffer[Row](after)
        val tail = new java.util.ArrayDeque[Row](math.max(before, 1))
        it.foreach { r =>
          if (head.length < after) head += r
          if (before > 0) {
            if (tail.size == before) tail.pollFirst()
            tail.addLast(r)
          }
        }
        Iterator((pid, (head.toArray, tail.toArray(Array.empty[Row]))))
      }.collect().toMap
    val edgesB = spark.sparkContext.broadcast(edges)

    // Job 2: one pass over the already-sorted partitions; neighbors'
    // edges are prepended/appended from the broadcast.
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val e = edgesB.value
      val prev = if (before > 0) e.get(pid - 1).map(_._2).getOrElse(Array.empty[Row])
                 else Array.empty[Row]
      val next = if (after > 0) e.get(pid + 1).map(_._1).getOrElse(Array.empty[Row])
                 else Array.empty[Row]
      val own = it.toArray
      if (own.isEmpty) Iterator.empty
      else {
        val block: IndexedSeq[Row] = prev.toIndexedSeq ++ own ++ next
        fn(block, prev.length, prev.length + own.length)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
