package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Cohort retention, ordered funnels, PSI drift: hand-computable
  * semantics on tiny corpora plus invariants (identical populations
  * drift zero; shifted populations drift positive). */
class AnalyticsSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 10) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("cohortRetention counts returning users against day-0 cohort size") {
    import spark.implicits._
    val ev = Seq(
      ("a", ts(1)), ("a", ts(2)), ("a", ts(4)),
      ("b", ts(1)),
      ("c", ts(2)), ("c", ts(3)), ("c", ts(3, 12))) // same-day dup collapses
      .toDF("user_id", "t")
    val out = Analytics.cohortRetention(ev, "user_id", "t", maxOffsetDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("2024-01-01", 0L)) == ((2L, 1.0)))   // a, b
    assert(out(("2024-01-01", 1L)) == ((1L, 0.5)))   // a returns day 2
    assert(out(("2024-01-01", 3L)) == ((1L, 0.5)))   // a returns day 4
    assert(out(("2024-01-02", 0L)) == ((1L, 1.0)))   // c
    assert(out(("2024-01-02", 1L)) == ((1L, 1.0)))   // c returns day 3
    assert(out.size == 5) // no offset-2 rows for either cohort
  }

  test("funnelStages requires non-decreasing first-occurrence times") {
    import spark.implicits._
    val ev = Seq(
      ("u1", "view", ts(1)), ("u1", "click", ts(2)), ("u1", "purchase", ts(3)),
      ("u2", "view", ts(1)), ("u2", "purchase", ts(2)), ("u2", "click", ts(3)),
      ("u3", "click", ts(1)),                       // never viewed
      ("u4", "purchase", ts(1)), ("u4", "view", ts(2)), ("u4", "click", ts(3)))
      .toDF("user_id", "event_type", "t")
    val out = Analytics.funnelStages(ev, "user_id", "t", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    // u1, u2, u4 viewed; all three have click after view; only u1's
    // purchase follows its click
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 3L, 1L))
    assert(out(1).getDouble(3) == 1.0) // conv_total at click = 3/3
    assert(math.abs(out(2).getDouble(4) - 1.0 / 3.0) < 1e-9) // prev conv
  }

  test("sessionPatternMatch: ordered subsequence within session boundaries") {
    import spark.implicits._
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val ev = Seq(
      // u1 session 1: view → x → click → purchase (matched)
      ("u1", t(0), 1L, "view"), ("u1", t(1), 2L, "error"),
      ("u1", t(2), 3L, "click"), ("u1", t(3), 4L, "purchase"),
      // u2: click before view — wrong order, unmatched
      ("u2", t(0), 5L, "click"), ("u2", t(1), 6L, "view"),
      ("u2", t(2), 7L, "purchase"),
      // u3: stages split ACROSS sessions (gap > 30 min) — neither matches
      ("u3", t(0), 8L, "view"), ("u3", t(1), 9L, "click"),
      ("u3", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 10L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.sessionPatternMatch(ev, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(("u1", 1L)) == ((4L, true)))
    assert(out(("u2", 1L)) == ((3L, false)))
    assert(out(("u3", 1L)) == ((2L, false)))
    assert(out(("u3", 2L)) == ((1L, false)))
  }

  test("scd2 keeps only changed versions and chains validity intervals") {
    import spark.implicits._
    def d(m: Int) = java.sql.Timestamp.valueOf(f"2024-$m%02d-01 00:00:00")
    val v = Seq(
      (1L, "A", 10.0, d(1)), (1L, "A", 10.0, d(2)), (1L, "B", 10.0, d(3)),
      (2L, "A", 5.0, d(1)), (2L, "A", 6.0, d(2)), (2L, "A", 6.0, d(3)))
      .toDF("key", "status", "price", "snap_ts")
    val out = Analytics.scd2(v, Seq("key"), "snap_ts", Seq("status", "price"))
      .orderBy("key", "valid_from").collect()
    // key 1: v1 (A,10) valid [Jan, Mar), v2 dropped (unchanged), v3 (B,10) current
    // key 2: v1 (A,5) [Jan, Feb), v2 (A,6) current, v3 dropped
    assert(out.length == 4)
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1(0).getString(1) == "A" && k1(0).getTimestamp(4) == d(3)
      && !k1(0).getBoolean(5))
    assert(k1(1).getString(1) == "B" && k1(1).isNullAt(4)
      && k1(1).getBoolean(5))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2(0).getDouble(2) == 5.0 && k2(0).getTimestamp(4) == d(2))
    assert(k2(1).getDouble(2) == 6.0 && k2(1).getBoolean(5))
  }

  test("associationReport: independence gives zero, determinism gives full V") {
    import spark.implicits._
    // perfectly independent 2x2: every cell 25
    val ind = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 0 until 25)
      yield (a, b)).toDF("a", "b")
    val r1 = Analytics.associationReport(ind, "a", "b").collect()(0)
    assert(r1.getDouble(0) == 0.0 && r1.getLong(1) == 1L &&
      r1.getDouble(2) == 0.0 && r1.getDouble(3) == 0.0 &&
      r1.getLong(4) == 100L)
    // perfectly dependent: a determines b -> chi2 = n, V = 1, MI = ln 2
    val dep = (Seq.fill(50)(("x", "u")) ++ Seq.fill(50)(("y", "v")))
      .toDF("a", "b")
    val r2 = Analytics.associationReport(dep, "a", "b").collect()(0)
    assert(r2.getDouble(0) == 100.0)
    assert(r2.getDouble(2) == 1.0)
    assert(math.abs(r2.getDouble(3) - math.log(2)) < 1e-9)
  }

  test("jaroWinkler kernel: canonical values, boost threshold, edges") {
    import graft.functions.TextKernels.jaroWinkler
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    assert(math.abs(jaroWinkler(u("martha"), u("marhta")) - 0.9611111111111111) < 1e-15)
    assert(math.abs(jaroWinkler(u("dixon"), u("dicksonx")) - 0.8133333333333332) < 1e-14)
    // sub-0.7 jaro: NO Winkler boost despite the 4-char common prefix
    assert(math.abs(jaroWinkler(u("red bolt"), u("red ring")) - 2.0 / 3.0) < 1e-15)
    assert(jaroWinkler(u("aaaa"), u("aaaa")) == 1.0)
    assert(jaroWinkler(u(""), u("")) == 0.0) // DuckDB's empty-side edge
    assert(jaroWinkler(u("x"), u("")) == 0.0)
    assert(jaroWinkler(u("x"), u("y")) == 0.0)
  }

  test("psiReport is zero on identical populations, positive under shift") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val base = (0 until 2000).map(_ => rnd.nextDouble() * 100)
    val same = (base.map((_, true)) ++ base.map((_, false)))
      .toDF("v", "isref")
    val psiSame = Analytics.psiReport(same, "v", col("isref"))
      .agg(sum("psi_term")).collect()(0).getDouble(0)
    assert(psiSame == 0.0)
    val shifted = (base.map((_, true)) ++ base.map(x => (x + 30.0, false)))
      .toDF("v", "isref")
    val rep = Analytics.psiReport(shifted, "v", col("isref")).collect()
    assert(rep.length == 10)
    assert(rep.map(_.getLong(1)).sum == 2000L) // all ref rows bucketed
    assert(rep.map(_.getLong(2)).sum == 2000L)
    val psiShift = rep.map(_.getDouble(5)).sum
    assert(psiShift > 0.25, s"expected large drift, got $psiShift")
  }
}
