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
