package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, DateType}

/** As-of (nearest-key) join — the pandas `merge_asof` semantics the
  * reference implements with neighbor-partition overlap
  * (`/root/reference/dask_expr/_merge_asof.py:17-425`), re-expressed
  * Spark-first as a single union + ordered window pass.
  *
  * Semantics (mirroring pandas/dask):
  *   - `direction = backward`: match the last right row with key <= left key
  *     (`<` when `allowExactMatches = false`).
  *   - `direction = forward`: first right row with key >= left key.
  *   - `direction = nearest`: closer of the two; ties go backward.
  *   - `by`: equality keys that partition the match space.
  *   - `tolerance`: max key distance (in key units; microseconds for
  *     timestamp keys); out-of-tolerance matches are nulled, the left
  *     row is kept (left-join semantics).
  *
  * Scale design: with `by` keys the window partitions by them — fully
  * parallel, one shuffle of the unioned inputs. Without `by`, a naive
  * global window would serialize on one partition, so rows are
  * range-bucketed on the key and each bucket receives carry-in rows
  * (the last right row before the bucket for backward matches, the
  * first right row after it for forward), computed from a tiny
  * bucket-level table. Every stage is a DataFrame op, so Catalyst/AQE
  * plan the shuffles; nothing is collected to the driver but the
  * global [min, max] of the key.
  */
object AsOfJoin {

  private val K = "__graft_k"        // numeric sort key
  private val SIDE = "__graft_side"  // 1 = left row, 0 = right row
  private val ORD = "__graft_ord"    // tie order at equal keys
  private val B = "__graft_b"        // range bucket (ungrouped path)
  private val MID = "__graft_mid"    // right-row position for deterministic ties
  private val BW = "__graft_bw"      // backward match struct
  private val FW = "__graft_fw"      // forward match struct
  private val RK = "__graft_rk"      // matched right key (inside structs)

  def mergeAsOf(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String] = Nil,
      direction: String = "backward",
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true,
      rightSuffix: String = "_right",
      numBuckets: Int = 256): DataFrame = {

    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")

    def keyNum(df: DataFrame): Column = df.schema(on).dataType match {
      case TimestampType => unix_micros(col(on)).cast("double")
      case DateType => datediff(col(on), lit("1970-01-01")).cast("double")
      case _ => col(on).cast("double")
    }

    val leftCols = left.columns.toSeq
    val rightValNames = right.columns.filterNot(c => c == on || by.contains(c)).toSeq
    val outName: Map[String, String] = rightValNames.map { c =>
      c -> (if (leftCols.contains(c)) c + rightSuffix else c)
    }.toMap

    val needBw = direction == "backward" || direction == "nearest"
    val needFw = direction == "forward" || direction == "nearest"

    // Right rows carry their key + values as one struct so a single
    // last()/ignoreNulls window propagates the whole match.
    val rmatch = struct(
      (col(K).as(RK) +: rightValNames.map(c => col(c).as(outName(c)))): _*)

    val l = left
      .withColumn(K, keyNum(left))
      .withColumn(SIDE, lit(1))

    // Positional id makes the equal-(key, tie-order) winner deterministic:
    // pandas matches the positionally-last right row backward and the
    // positionally-first forward; without it last() depends on shuffle order.
    val r = right.withColumn(K, keyNum(right))
      .select((by.map(col) :+ col(K) :+ rmatch.as("__graft_rm")): _*)
      .withColumn(SIDE, lit(0))
      .withColumn(MID, monotonically_increasing_id())

    // unionByName fills the side-specific columns (left payload on right
    // rows, match struct on left rows) with nulls.
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // At equal keys: exact matches allowed → right rows sort before left
    // rows so the frame [unboundedPreceding, current] includes them;
    // disallowed → after, so they are excluded. Same rule mirrored for
    // the forward (descending) window.
    val ordAsc = if (allowExactMatches) when(col(SIDE) === 0, 0).otherwise(1)
                 else when(col(SIDE) === 0, 1).otherwise(0)

    val (withBuckets, partCols) =
      if (by.nonEmpty) (unioned, by)
      else bucketize(unioned, numBuckets, needBw, needFw)

    var cur = withBuckets.withColumn(ORD, ordAsc)
    if (needBw) {
      val wB = Window.partitionBy(partCols.map(col): _*)
        .orderBy(col(K).asc, col(ORD).asc, col(MID).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cur = cur.withColumn(BW, last(
        when(col(SIDE) === 0, col("__graft_rm")), ignoreNulls = true).over(wB))
    }
    if (needFw) {
      // MID descends so last() lands on the positionally-first right row
      // among equal keys (the forward-direction pandas winner).
      val wF = Window.partitionBy(partCols.map(col): _*)
        .orderBy(col(K).desc, col(ORD).asc, col(MID).desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cur = cur.withColumn(FW, last(
        when(col(SIDE) === 0, col("__graft_rm")), ignoreNulls = true).over(wF))
    }

    val onlyLeft = cur.filter(col(SIDE) === 1)

    def inTol(m: Column): Column = tolerance match {
      case Some(t) => m.isNotNull && abs(col(K) - m.getField(RK)) <= t
      case None => m.isNotNull
    }

    val matched: Column = direction match {
      case "backward" => when(inTol(col(BW)), col(BW))
      case "forward" => when(inTol(col(FW)), col(FW))
      case "nearest" =>
        val bwOk = inTol(col(BW))
        val fwOk = inTol(col(FW))
        val bwDist = abs(col(K) - col(BW).getField(RK))
        val fwDist = abs(col(K) - col(FW).getField(RK))
        when(bwOk && (!fwOk || bwDist <= fwDist), col(BW))
          .when(fwOk, col(FW))
    }

    val out = onlyLeft.withColumn("__graft_m", matched)
    out.select((leftCols.map(col) ++
      rightValNames.map(c =>
        col("__graft_m").getField(outName(c)).as(outName(c)))): _*)
  }

  /** Ungrouped path: fixed-width range buckets over the key domain plus
    * carry-in rows so each bucket window is self-contained. Only the
    * global key min/max reach the driver; the bucket-level carry tables
    * have at most `numBuckets` rows.
    */
  private def bucketize(
      unioned: DataFrame,
      numBuckets: Int,
      needBw: Boolean,
      needFw: Boolean): (DataFrame, Seq[String]) = {

    val Seq(mn, mx) = unioned.agg(min(col(K)), max(col(K)))
      .head().toSeq.map(v => Option(v).map(_.toString.toDouble).getOrElse(0.0))
    val width = math.max((mx - mn) / numBuckets, java.lang.Double.MIN_NORMAL)
    val bucket = least(floor((col(K) - lit(mn)) / lit(width)), lit(numBuckets - 1))
      .cast("int")

    val withB = unioned.withColumn(B, bucket)
    val rights = withB.filter(col(SIDE) === 0)
      .select(col(B), col(K), col(MID), col("__graft_rm"))

    val spine = unioned.sparkSession.range(numBuckets.toLong)
      .select(col("id").cast("int").as(B))

    def carry(into: String): DataFrame = {
      // bucket-level extreme right row, then a running fill over the
      // (tiny) bucket spine, shifted one bucket so it lands strictly
      // outside its origin bucket.
      // (K, MID) struct ordering keeps the carry deterministic when a
      // bucket's extreme key is duplicated (same pandas tie rule as the
      // in-window pass: last position backward, first position forward).
      val perB =
        if (into == "bw")
          rights.groupBy(col(B))
            .agg(max_by(col("__graft_rm"), struct(col(K), col(MID))).as("__graft_rm"))
        else
          rights.groupBy(col(B))
            .agg(min_by(col("__graft_rm"), struct(col(K), col(MID))).as("__graft_rm"))
      val filled = spine.join(perB, Seq(B), "left")
      val w =
        if (into == "bw")
          Window.orderBy(col(B).asc).rowsBetween(Window.unboundedPreceding, -1)
        else
          Window.orderBy(col(B).desc).rowsBetween(Window.unboundedPreceding, -1)
      filled
        .withColumn("__graft_rm", last(col("__graft_rm"), ignoreNulls = true).over(w))
        .filter(col("__graft_rm").isNotNull)
        .select(col(B), col("__graft_rm").getField(RK).as(K),
          col("__graft_rm"), lit(0).as(SIDE))
    }

    var result = withB
    if (needBw) result = result.unionByName(carry("bw"), allowMissingColumns = true)
    if (needFw) result = result.unionByName(carry("fw"), allowMissingColumns = true)
    (result, Seq(B))
  }
}
