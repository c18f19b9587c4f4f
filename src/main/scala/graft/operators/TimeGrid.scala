package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — pandas
  * `resample(freq).asfreq().ffill()`: project each key's observations
  * onto a gap-free time grid and carry the last observation forward
  * into empty buckets. The missing-data companion to the aggregate
  * resampler (sensor/market feeds stop emitting when nothing changes;
  * training features need a dense grid).
  *
  * Plan shape: per-key bounds (one partial-agg groupBy), grid via
  * `sequence()` + explode (rows ∝ key count × day span, never a
  * driver loop), one (key, bucket) left join against the per-bucket
  * last observation (max_by with a deterministic (ts, tiebreak)
  * struct), and a partitioned `last(ignoreNulls)` running window for
  * the fill. Every stage is key-partitioned — no global window, no
  * collect. */
object TimeGrid {

  /** Dense `unit` grid per `keyCol` from each key's first to last
    * observation, value forward-filled; `tieCol` breaks equal-ts
    * observations deterministically (pass a unique id).
    * Output: keyCol, bucket, value_ff, observed.
    *
    * Grid rows per key = span/unit: a 10-year key is ~3.7k rows at
    * "day" but ~315M at "second" — pick the unit for the span, the
    * explode is per-key-linear and the operator adds no other state. */
  /** Temporal train/test split with an embargo gap — the time-series
    * leakage control (de Prado 2018 "purged" splits; the temporal
    * counterpart of content-hash [[TextDedup.leakageSafeSplit]]): test =
    * the trailing `testUnits` of the corpus clock, train = everything
    * older than an additional `embargoUnits` buffer, and the buffer
    * rows are labeled "embargo" (callers drop them) so rows adjacent to
    * the boundary can't leak near-future information into training.
    *
    * Plan shape: ONE one-row aggregate (max ts) broadcast back by
    * cross join, then a map-only CASE — the cutoffs ride the plan, no
    * per-row state, no window, nothing driver-side. Interval
    * arithmetic on whole `unit`s is exact on microsecond timestamps,
    * so any engine replaying the same CASE reproduces the labels
    * bit-for-bit. */
  def temporalSplit(df: DataFrame, tsCol: String, testUnits: Int,
      embargoUnits: Int, unit: String = "day"): DataFrame = {
    val cuts = df.agg(max(col(tsCol)).as("__end"))
      .select(
        (col("__end") - expr(s"interval $testUnits $unit")).as("__test_start"),
        (col("__end") - expr(s"interval ${testUnits + embargoUnits} $unit"))
          .as("__embargo_start"))
    df.crossJoin(broadcast(cuts))
      .withColumn("split",
        // a NULL timestamp must NOT fall through to "train" — an
        // undated row could sit inside the test window, the exact leak
        // the embargo exists to prevent; label it for the caller to
        // drop or repair
        when(col(tsCol).isNull, lit("unknown"))
          .when(col(tsCol) > col("__test_start"), lit("test"))
          .when(col(tsCol) > col("__embargo_start"), lit("embargo"))
          .otherwise(lit("train")))
      .drop("__test_start", "__embargo_start")
  }

  /** Dense `unit` grid per key with LINEAR interpolation between
    * observations (pandas `resample(unit).interpolate('linear')`
    * semantics on the bucket grid): observed buckets keep their value,
    * interior gaps interpolate between the straddling observations by
    * bucket-time fraction, trailing gaps carry the last value forward,
    * leading gaps are NULL. Same key-partitioned plan as
    * [[asFreqFfill]] plus one backward window (first following
    * observation); fractions are ratios of exact microsecond integers,
    * so any engine replays them bit-for-bit.
    *
    * Output: keyCol, bucket, value_li, observed. */
  def interpolateLinear(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, unit: String = "day"): DataFrame = {
    val step = expr(s"interval 1 $unit")
    val bounds = df.groupBy(keyCol).agg(
      date_trunc(unit, min(col(tsCol))).as("__d0"),
      date_trunc(unit, max(col(tsCol))).as("__d1"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"), step)).as("bucket"))
    val obs = df.groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(max_by(col(valueCol), struct(col(tsCol), col(tieCol))).as("__v"))
    val wb = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tagged = grid.join(obs, Seq(keyCol, "bucket"), "left")
      .withColumn("__o",
        when(col("__v").isNotNull, struct(col("bucket").as("b"), col("__v").as("v"))))
      .withColumn("__p", last(col("__o"), ignoreNulls = true).over(wb))
      .withColumn("__n", first(col("__o"), ignoreNulls = true).over(wf))
    val pb = col("__p.b"); val pv = col("__p.v")
    val nb = col("__n.b"); val nv = col("__n.v")
    val frac = (unix_micros(col("bucket")) - unix_micros(pb)).cast("double") /
      (unix_micros(nb) - unix_micros(pb)).cast("double")
    tagged.select(col(keyCol), col("bucket"),
      when(col("__v").isNotNull, col("__v"))
        .when(col("__p").isNotNull && col("__n").isNotNull,
          pv + (nv - pv) * frac)
        .when(col("__p").isNotNull, pv)
        .as("value_li"),
      col("__v").isNotNull.as("observed"))
  }

  def asFreqFfill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, unit: String = "day"): DataFrame = {
    val step = expr(s"interval 1 $unit")
    val bounds = df.groupBy(keyCol).agg(
      date_trunc(unit, min(col(tsCol))).as("__d0"),
      date_trunc(unit, max(col(tsCol))).as("__d1"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"), step)).as("bucket"))
    val obs = df.groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(max_by(col(valueCol), struct(col(tsCol), col(tieCol))).as("__v"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("__v"), ignoreNulls = true).over(w).as("value_ff"),
        col("__v").isNotNull.as("observed"))
  }
}
