package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keyed sequential recurrences — the operator family a declarative
  * window cannot express (each output depends on the previous OUTPUT,
  * not on a frame of inputs). The canonical member is the
  * exponentially-weighted mean (pandas `ewm(alpha).mean()`,
  * adjust=True):
  *
  *   num_i = x_i + (1−α)·num_{i−1};  den_i = 1 + (1−α)·den_{i−1};
  *   y_i = num_i / den_i
  *
  * Execution shape: ONE hash shuffle on the key, sort within
  * partitions, then a streaming fold over each sorted partition with
  * state reset at key boundaries — no per-group materialization, so a
  * giant key streams through (the grouped-iterator form would buffer
  * it). The naive closed-form alternative (two cumulative sums scaled
  * by (1−α)^−i) overflows past a few hundred rows and is not a
  * scale-safe plan.
  *
  * The fold's float arithmetic is written to be replayable verbatim:
  * `x + decay*num` with decay derived as `1 − alpha` in IEEE, exactly
  * what a SQL engine computes for `value + (1 - alpha) * num` in a
  * recursive CTE.
  */
object Recurrence {

  /** Append `out` = EWM(alpha, adjust=True) of `valueCol` per `keyCol`
    * in `orderCols` order. Null values emit null and leave the state
    * untouched (pandas ignore_na=False differs; documented deviation —
    * nulls don't occur in the engine's corpora). */
  def ewm(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, out: String = "ewm"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val decay = 1.0 - alpha
    val sorted = df.repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
    val schema = sorted.schema.add(StructField(out, DoubleType))
    implicit val enc = Encoders.row(schema)
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    sorted.mapPartitions { it =>
      var curKey: Any = null
      var started = false
      var num = 0.0
      var den = 0.0
      it.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          num = 0.0; den = 0.0; curKey = k; started = true
        }
        val y: Any =
          if (r.isNullAt(vIdx)) null
          else {
            // getAs[Number]: the value column may be int/long/float —
            // a raw getDouble would ClassCastException on non-double
            val x = r.getAs[Number](vIdx).doubleValue()
            num = x + decay * num
            den = 1.0 + decay * den
            num / den
          }
        Row.fromSeq(r.toSeq :+ y)
      }
    }
  }

  /** Append `out` = time-aware EWM over IRREGULAR observations
    * (pandas `ewm(halflife=..., times=...)`, adjust=True): each step's
    * decay is 0.5^(Δdays / halflifeDays) where Δdays is the
    * calendar-day gap (UTC epoch days) to the previous observation of
    * the key — a burst of same-day events barely decays, a month gap
    * nearly resets. Same one-shuffle streaming-fold shape as [[ewm]].
    *
    * Replayability note: with integer halflifeDays and day-granular
    * gaps the decay is an exact power of two (any correctly-rounded
    * pow gives exact 2^-k), so a recursive-CTE oracle replays the fold
    * bit-for-bit. */
  def ewmIrregular(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, tsCol: String, halflifeDays: Double,
      out: String = "ewm_t"): DataFrame = {
    require(halflifeDays > 0, s"halflifeDays > 0, got $halflifeDays")
    val sorted = df.repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
    val schema = sorted.schema.add(StructField(out, DoubleType))
    implicit val enc = Encoders.row(schema)
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val tIdx = sorted.schema.fieldIndex(tsCol)
    sorted.mapPartitions { it =>
      var curKey: Any = null
      var started = false
      var num = 0.0; var den = 0.0; var prevDay = 0L
      it.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          num = 0.0; den = 0.0; prevDay = Long.MinValue
          curKey = k; started = true
        }
        val y: Any =
          if (r.isNullAt(vIdx) || r.isNullAt(tIdx)) null
          else {
            val x = r.getAs[Number](vIdx).doubleValue()
            val day = Math.floorDiv(
              r.getAs[java.sql.Timestamp](tIdx).getTime, 86400000L)
            val decay =
              if (prevDay == Long.MinValue) 0.0
              else math.pow(0.5, (day - prevDay).toDouble / halflifeDays)
            num = x + decay * num
            den = 1.0 + decay * den
            prevDay = day
            num / den
          }
        Row.fromSeq(r.toSeq :+ y)
      }
    }
  }

  /** Append `outVar`/`outStd` = EWM(alpha, adjust=True) bias-corrected
    * variance and std of `valueCol` per `keyCol` (pandas
    * `ewm(alpha).var()` / `.std()`, bias=False). Four accumulators
    * roll forward with the same one-shuffle streaming-fold shape as
    * [[ewm]]:
    *
    *   sw  = 1 + d·sw      (sum of weights)
    *   sw2 = 1 + d·d·sw2   (sum of squared weights)
    *   swx = x + d·swx     (weighted value sum)
    *   sxx = x·x + d·sxx   (weighted square sum)
    *   var = (sw·sxx − swx·swx) / (sw·sw − sw2)
    *
    * NULL until the reliability denominator sw² − sw2 is positive
    * (i.e. before the second observation), matching pandas bias=False.
    * Every fold step and the final rational are written as the exact
    * scalar expression a recursive-CTE replay computes, so results are
    * bit-identical across engines (the round-11 q_rolling_skew lesson).
    */
  def ewmVar(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, alpha: Double,
      outVar: String = "ewm_var", outStd: String = "ewm_std"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val decay = 1.0 - alpha
    val sorted = df.repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
    val schema = sorted.schema
      .add(StructField(outVar, DoubleType))
      .add(StructField(outStd, DoubleType))
    implicit val enc = Encoders.row(schema)
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    sorted.mapPartitions { it =>
      var curKey: Any = null
      var started = false
      var sw = 0.0; var sw2 = 0.0; var swx = 0.0; var sxx = 0.0
      it.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          sw = 0.0; sw2 = 0.0; swx = 0.0; sxx = 0.0
          curKey = k; started = true
        }
        val (vr, sr): (Any, Any) =
          if (r.isNullAt(vIdx)) (null, null)
          else {
            val x = r.getAs[Number](vIdx).doubleValue()
            sw = 1.0 + decay * sw
            sw2 = 1.0 + decay * decay * sw2
            swx = x + decay * swx
            sxx = x * x + decay * sxx
            val den = sw * sw - sw2
            if (den > 0) {
              val v = (sw * sxx - swx * swx) / den
              (v, if (v >= 0) math.sqrt(v) else null)
            } else (null, null)
          }
        Row.fromSeq(r.toSeq :+ vr :+ sr)
      }
    }
  }
}
