package graft

import org.apache.spark.sql.functions._
import graft.operators.Recurrence

/** EWM keyed recurrence: formula equivalence, key resets, partition
  * invariance, null policy. */
class RecurrenceSpec extends SparkSpec {

  private def refEwm(xs: Seq[Double], alpha: Double): Seq[Double] = {
    // direct pandas adjust=True formula, different arithmetic path than
    // the operator's streaming fold
    xs.indices.map { i =>
      val w = (0 to i).map(j => math.pow(1 - alpha, i - j))
      (0 to i).map(j => w(j) * xs(j)).sum / w.sum
    }
  }

  test("ewm matches the closed-form pandas formula per key") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for (k <- 0 until 5; i <- 0 until 40)
      yield (k.toLong, i.toLong, rnd.nextDouble() * 100 - 50)
    val out = Recurrence.ewm(
        rows.toDF("k", "i", "v").repartition(7), // scrambled input partitioning
        "k", Seq("i"), "v", alpha = 0.3)
      .select("k", "i", "ewm").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (k <- 0 until 5) {
      val xs = rows.filter(_._1 == k).sortBy(_._2).map(_._3)
      val expect = refEwm(xs, 0.3)
      xs.indices.foreach { i =>
        val got = out((k.toLong, i.toLong))
        assert(math.abs(got - expect(i)) < 1e-9,
          s"k=$k i=$i got $got want ${expect(i)}")
      }
    }
  }

  test("ewm state resets at key boundaries and first row equals x1") {
    import spark.implicits._
    val df = Seq((1L, 0L, 10.0), (1L, 1L, 20.0), (2L, 0L, 99.0))
      .toDF("k", "i", "v")
    val out = Recurrence.ewm(df, "k", Seq("i"), "v", alpha = 0.5)
      .select("k", "i", "ewm").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 0L)) == 10.0)
    assert(out((2L, 0L)) == 99.0) // unpolluted by key 1's state
    // adjust=True second value: (0.5*10 + 20) / 1.5
    assert(math.abs(out((1L, 1L)) - (20.0 + 0.5 * 10.0) / 1.5) < 1e-12)
  }

  private def refEwmVar(xs: Seq[Double], alpha: Double): Seq[Option[Double]] = {
    // direct pandas adjust=True bias=False weighted variance, a
    // different arithmetic path than the operator's 4-accumulator fold
    xs.indices.map { i =>
      val w = (0 to i).map(j => math.pow(1 - alpha, i - j))
      val sw = w.sum
      val sw2 = w.map(x => x * x).sum
      val mu = (0 to i).map(j => w(j) * xs(j)).sum / sw
      val m2 = (0 to i).map(j => w(j) * (xs(j) - mu) * (xs(j) - mu)).sum / sw
      val den = sw * sw - sw2
      if (den > 0) Some(m2 * sw * sw / den) else None
    }
  }

  test("ewmVar matches the closed-form pandas weighted variance per key") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 0 until 4; i <- 0 until 30)
      yield (k.toLong, i.toLong, rnd.nextDouble() * 10 - 5)
    val out = Recurrence.ewmVar(
        rows.toDF("k", "i", "v").repartition(5),
        "k", Seq("i"), "v", alpha = 0.25)
      .select("k", "i", "ewm_var", "ewm_std").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    for (k <- 0 until 4) {
      val xs = rows.filter(_._1 == k).sortBy(_._2).map(_._3)
      val expect = refEwmVar(xs, 0.25)
      xs.indices.foreach { i =>
        val (gv, gs) = out((k.toLong, i.toLong))
        (gv, expect(i)) match {
          case (Some(g), Some(e)) =>
            assert(math.abs(g - e) < 1e-9, s"k=$k i=$i got $g want $e")
            assert(gs.exists(s => math.abs(s - math.sqrt(e)) < 1e-9))
          case (None, None) => assert(gs.isEmpty)
          case other => fail(s"k=$k i=$i null mismatch: $other vs ${expect(i)}")
        }
      }
    }
  }

  test("ewmVar is NULL on the first observation and resets per key") {
    import spark.implicits._
    val df = Seq((1L, 0L, 10.0), (1L, 1L, 20.0), (2L, 0L, 99.0))
      .toDF("k", "i", "v")
    val out = Recurrence.ewmVar(df, "k", Seq("i"), "v", alpha = 0.5)
      .select("k", "i", "ewm_var").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out((1L, 0L)).isEmpty)
    assert(out((2L, 0L)).isEmpty) // key 2 unpolluted by key 1's state
    // two points, weights (0.5, 1): unbiased weighted var collapses to
    // w·(x1−x2)²/Σw ... against the closed form directly:
    val e = refEwmVar(Seq(10.0, 20.0), 0.5)(1).get
    assert(math.abs(out((1L, 1L)).get - e) < 1e-12)
  }

  test("ewmIrregular decays by calendar-day gaps (closed-form check)") {
    import spark.implicits._
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // gaps: 0 days (same day), 2 days, 1 day
    val rows = Seq(
      (1L, ts(1, 8), 1L, 10.0), (1L, ts(1, 20), 2L, 20.0),
      (1L, ts(3, 8), 3L, 30.0), (1L, ts(4, 8), 4L, 40.0))
    val out = Recurrence.ewmIrregular(rows.toDF("k", "t", "i", "v"),
        "k", Seq("t", "i"), "v", "t", halflifeDays = 1.0)
      .select("i", "ewm_t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // closed form with weights prod of per-step decays
    // i=1: 10. i=2: decay 0.5^0=1 -> (20 + 10)/2 = 15
    // i=3: decay 0.5^2=0.25 -> num = 30 + 0.25*30 = 37.5; den = 1 + 0.25*2 = 1.5 -> 25
    // i=4: decay 0.5 -> num = 40 + 18.75 = 58.75; den = 1 + 0.75 = 1.75
    assert(out(1L) == 10.0)
    assert(out(2L) == 15.0)
    assert(out(3L) == 25.0)
    assert(math.abs(out(4L) - 58.75 / 1.75) < 1e-12)
  }

  test("interpolateLinear: interior linear, trailing ffill, leading NULL") {
    import spark.implicits._
    import graft.operators.TimeGrid
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // key 1 observes days 2, 5, 6; grid spans 2..6
    val df = Seq((1L, ts(2), 10.0, 1L), (1L, ts(5), 40.0, 2L),
      (1L, ts(6), 0.0, 3L)).toDF("k", "t", "v", "id")
    val out = TimeGrid.interpolateLinear(df, "k", "t", "v", "id")
      .orderBy("bucket").collect()
      .map(r => r.getTimestamp(1).toString.take(10) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      "2024-01-02" -> (Some(10.0), true),
      "2024-01-03" -> (Some(20.0), false),  // 10 + 30 * 1/3
      "2024-01-04" -> (Some(30.0), false),  // 10 + 30 * 2/3
      "2024-01-05" -> (Some(40.0), true),
      "2024-01-06" -> (Some(0.0), true)))
    // key with a single observation: the one bucket, observed
    val one = TimeGrid.interpolateLinear(
      Seq((9L, ts(4), 7.0, 1L)).toDF("k", "t", "v", "id"), "k", "t", "v", "id")
      .collect()
    assert(one.length == 1 && one(0).getDouble(2) == 7.0)
  }

  test("asFreqFfill fills gaps forward on a dense day grid") {
    import spark.implicits._
    import graft.operators.TimeGrid
    def ts(d: String) = java.sql.Timestamp.valueOf(s"2024-01-0$d 10:00:00")
    val df = Seq(
      (1L, ts("1"), 10.0, 100L),
      (1L, ts("1"), 11.0, 101L), // same day, later event_id wins
      (1L, ts("4"), 40.0, 102L), // days 2-3 are gaps
      (2L, ts("2"), 7.0, 103L))
      .toDF("k", "ts", "v", "id")
    val out = TimeGrid.asFreqFfill(df, "k", "ts", "v", "id")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10),
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", 11.0, true),
      (1L, "2024-01-02", 11.0, false),
      (1L, "2024-01-03", 11.0, false),
      (1L, "2024-01-04", 40.0, true),
      (2L, "2024-01-02", 7.0, true)))
  }

  test("temporalSplit labels test / embargo / train from the corpus clock") {
    import spark.implicits._
    import graft.operators.TimeGrid
    def ts(d: Int, h: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val df = Seq(
      (1L, ts(1)),        // oldest → train
      (2L, ts(20)),       // 10 days before end → train
      (3L, ts(22)),       // inside (end-9d, end-7d] → embargo
      (4L, ts(23, 1)),    // just past test_start → test
      (5L, ts(30)))       // end → test
      .toDF("id", "ts")
    val got = TimeGrid.temporalSplit(df, "ts", testUnits = 7,
        embargoUnits = 2).select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "test", 5L -> "test"))
  }

  test("temporalSplit labels a NULL timestamp 'unknown', never 'train'") {
    import graft.operators.TimeGrid
    val df = spark.createDataFrame(Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, Some(java.sql.Timestamp.valueOf("2024-01-30 00:00:00"))),
      (3L, None: Option[java.sql.Timestamp])))
      .toDF("id", "ts")
    val got = TimeGrid.temporalSplit(df, "ts", testUnits = 7,
        embargoUnits = 2).select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "train", 2L -> "test", 3L -> "unknown"))
  }

  test("ewm accepts non-double value columns (long)") {
    import spark.implicits._
    val df = Seq((1L, 0L, 10L), (1L, 1L, 20L)).toDF("k", "i", "v")
    val out = Recurrence.ewm(df, "k", Seq("i"), "v", alpha = 0.5)
      .select("i", "ewm").orderBy("i").collect()
    assert(out(0).getDouble(1) == 10.0)
    assert(math.abs(out(1).getDouble(1) - (20.0 + 0.5 * 10.0) / 1.5) < 1e-12)
  }

  test("ewm nulls emit null and leave the state untouched") {
    import spark.implicits._
    val df = Seq((1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 2L, Some(10.0)))
      .toDF("k", "i", "v")
    val out = Recurrence.ewm(df, "k", Seq("i"), "v", alpha = 0.5)
      .select("i", "ewm").orderBy("i").collect()
    assert(out(0).getDouble(1) == 10.0)
    assert(out(1).isNullAt(1))
    // state skipped the null: same as two consecutive 10s
    assert(math.abs(out(2).getDouble(1) - 10.0) < 1e-12)
  }
}
