package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side data layout for scan pruning at scale.
  *
  * At 100 TB the cheapest scan is the one that never happens: directory
  * partitioning prunes whole partitions at planning time
  * (`PartitionFilters` in the scan), range-clustered writes give each
  * parquet file/row-group tight min/max stats so selective filters skip
  * them, and Z-ordering extends that skipping to SEVERAL filter columns
  * at once — a filter on either dimension maps to a contiguous band of
  * the interleaved-bit curve, so most files miss it entirely (the
  * Delta/Iceberg OPTIMIZE ZORDER technique, here as a plain column
  * expression + repartitionByRange).
  */
object Layout {

  /** Hive-style directory partitioning: one directory per distinct
    * value of `cols`. Readers with equality/range filters on those
    * columns prune at planning time, before any file IO. Keep the
    * partition column count low-cardinality — a high-cardinality
    * partition key means millions of tiny files (the classic lake
    * mistake).
    *
    * Rows are shuffled onto the partition columns before the write:
    * without that, every one of the N input tasks opens a writer for
    * every partition value it sees (N × values small files, N × values
    * commit round-trips); with it, each directory receives a few
    * well-sized files. AQE splits any skewed partition value across
    * tasks, so one hot value doesn't serialize the write.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.repartition(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Range-clustered write: rows range-partitioned and sorted within
    * partitions on `cols`, so each output file covers a narrow key
    * range and its parquet min/max stats make row-group skipping
    * effective for filters on the leading columns.
    */
  def writeClustered(df: DataFrame, path: String, numFiles: Int, cols: String*): Unit =
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Z-value of `cols`: each column bucketed into 2^`bits` rank buckets
    * by approx-percentile split points (ONE bounded aggregation, driver
    * traffic O(cols × 2^bits) — never a global-order window), then the
    * bucket bits interleaved LSB-first. Rank bucketing is
    * distribution-free: skewed values still spread over all buckets.
    * Two-column filters both map to contiguous curve segments.
    */
  def zValue(df: DataFrame, bits: Int, cols: Seq[String]): DataFrame = {
    val n = 1 << bits
    val fracs = (1 until n).map(_.toDouble / n)
    val splitRow = df.select(cols.map(c =>
      expr(s"approx_percentile(CAST($c AS DOUBLE), array(${fracs.mkString(",")}), 10000)")
        .as(s"__s_$c")): _*).head()
    val bucketed = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val splits = splitRow.getSeq[Double](i)
      d.withColumn(s"__b$i",
        splits.map(s => when(col(c).cast("double") > s, 1L).otherwise(0L))
          .reduce(_ + _))
    }
    val z = (0 until bits).flatMap { bit =>
      cols.indices.map { i =>
        (shiftright(col(s"__b$i"), bit).bitwiseAND(1) *
          lit(1L << (bit.toLong * cols.size + i))): Column
      }
    }.reduce(_ + _)
    bucketed.withColumn("__z", z).drop(cols.indices.map(i => s"__b$i"): _*)
  }

  /** Z-ordered clustered write on `cols`: compute the z-value, range
    * partition + sort the data by it, drop the helper column, write.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int, bits: Int,
      cols: String*): Unit =
    zValue(df, bits, cols)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed + sorted table write (`bucketBy`): rows hashed into a
    * FIXED bucket count on `cols` and sorted within each bucket, with
    * the layout recorded in the catalog. Two tables bucketed the same
    * way join/aggregate on those columns with ZERO exchange — the
    * co-located join (reference BlockwiseMerge `_merge.py`) that turns
    * the recurring 100 TB fact-fact join into a map-side merge
    * (asserted in PlanAuditSpec "bucketed tables join without a
    * shuffle"). Bucket count is a layout contract: pick it for the
    * TARGET scale (buckets ≈ total size / healthy task size), not the
    * current one.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write-path for the hygiene indexes — the operational half of the
    * incremental (snapshot-N+1) funnel story. The cross-snapshot joins
    * (`TextDedup.winnowAgainstIndex` on `fp`,
    * `TextDedup.purgeAgainstIndex` on `__h`) are asymmetric
    * batch × index by construction; their "only the batch side
    * exchanges" property additionally needs the STORED index bucketed
    * on its join key, which this writes: the winnow-fingerprint index
    * `(idx_id, fp)` bucketed on `fp` and the window-hash index `(__h)`
    * bucketed on `__h`, both as catalog tables ([[writeBucketed]]).
    * Each daily refresh then reads the index straight from its buckets
    * (ZERO index-side exchange — LayoutSpec audits both joins) while
    * the much smaller batch shuffles into the same bucket count.
    *
    * Bucket count is the layout contract for the TARGET corpus scale
    * (buckets ≈ index size / healthy task size), not the current one —
    * at 100 TB a window-hash index is O(corpus tokens) 16-byte
    * digests, so thousands of buckets; tests use single digits. */
  def writeHygieneIndexes(corpus: DataFrame, idCol: String,
      textCol: String, fpTable: String, winTable: String,
      numBuckets: Int, k: Int = 3, w: Int = 4,
      indexWindowWords: Int = 4): Unit = {
    val fps = graft.operators.TextDedup
      .winnowFingerprints(corpus, idCol, textCol, k = k, w = w)
      .select(col(idCol).as("idx_id"), col("fp"))
    writeBucketed(fps, fpTable, numBuckets, "fp")
    val wins = graft.operators.TextDedup
      .windowHashIndex(corpus, textCol, windowWords = indexWindowWords)
    writeBucketed(wins, winTable, numBuckets, "__h")
  }

  /** Refresh step of the snapshot cycle: append an ADMITTED batch's
    * fingerprints and window hashes to the stored hygiene indexes, so
    * tomorrow's [[graft.operators.TextDedup.hygieneFunnelAgainstIndex]]
    * sees today's survivors. The append uses append-mode `saveAsTable`
    * carrying the table's OWN bucket spec read back from the catalog
    * (`insertInto` would silently IGNORE bucketing and break the
    * layout), so the zero-index-side-exchange property of the
    * incremental joins SURVIVES every refresh — LayoutSpec drives the
    * full two-day cycle and re-audits the join plans after the append.
    *
    * Both appends dedup the batch against the STORED table (one
    * asymmetric anti join each — batch × index, never index × index),
    * so the tables stay duplicate-free without ever being rewritten.
    * Cost per refresh: the batch side exchanges into the bucket count
    * and the stored side never exchanges, but the idempotency anti
    * joins still SCAN the stored tables once per refresh (column-
    * pruned to the key columns). The fp scan's join work is bounded by
    * first semi-joining the stored side down to the batch's distinct
    * `fp` values (broadcast, map-side), so only stored pairs that can
    * possibly collide with the batch reach the (idx_id, fp) anti join
    * — without it the anti join's keys (a superset of the `fp` bucket
    * key) would force the full stored table through the join. */
  def appendHygieneIndexes(admitted: DataFrame, idCol: String,
      textCol: String, fpTable: String, winTable: String,
      k: Int = 3, w: Int = 4, indexWindowWords: Int = 4): Unit = {
    val spark = admitted.sparkSession
    // Append-mode saveAsTable with the table's OWN bucket spec (read
    // from the catalog so a mismatch is impossible): new files land in
    // the existing bucket scheme; insertInto would silently ignore it.
    def appendBucketed(df: DataFrame, table: String, keyCol: String): Unit = {
      val spec = spark.sessionState.catalog
        .getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table))
        .bucketSpec
        .getOrElse(throw new IllegalArgumentException(
          s"appendHygieneIndexes: $table is not bucketed — write it " +
            "with writeHygieneIndexes first"))
      df.write.mode(SaveMode.Append)
        .bucketBy(spec.numBuckets, keyCol)
        .sortBy(keyCol)
        .format("parquet")
        .saveAsTable(table)
    }
    // Idempotent by (idx_id, fp) PAIR: a retried/replayed refresh is a
    // no-op (duplicated pairs would inflate winnowAgainstIndex's
    // n_shared counts), while a RE-ADMITTED id with changed text still
    // contributes its new fingerprints — deduping by id alone would
    // silently blind the near-dup index to recrawled content while the
    // window index (content-keyed) kept growing. One asymmetric
    // batch-side anti join against the stored pairs; history
    // accumulates (an id's superseded fingerprints stay indexed,
    // matching the window index's keep-everything semantics).
    // The stored side is semi-joined down to the batch's distinct fp
    // values FIRST (tiny broadcast, filters map-side over the bucketed
    // scan) because the anti join's (idx_id, fp) keys are a superset
    // of the fp bucket key — unbounded, the whole stored table would
    // ride through a join the bucket layout only partially serves.
    val batchFps = graft.operators.TextDedup
      .winnowFingerprints(admitted, idCol, textCol, k = k, w = w)
      .select(col(idCol).as("idx_id"), col("fp"))
      .localCheckpoint(false) // two consumers; winnow runs once
    val storedHits = spark.table(fpTable)
      .join(batchFps.select(col("fp")).distinct(), Seq("fp"), "left_semi")
    appendBucketed(
      batchFps.join(storedHits, Seq("idx_id", "fp"), "left_anti"),
      fpTable, "fp")
    appendBucketed(graft.operators.TextDedup
      .windowHashIndex(admitted, textCol, windowWords = indexWindowWords)
      .join(spark.table(winTable), Seq("__h"), "left_anti"),
      winTable, "__h")
  }
}
