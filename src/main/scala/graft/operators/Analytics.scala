package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics: cohort retention, ordered conversion
  * funnels, and PSI (population-stability-index) drift — the report
  * family every product/events pipeline composes by hand on the
  * reference engine, provided here as operators with the same
  * scale discipline as the rest of the library: grouped aggregates
  * keyed by user/bucket, broadcast-sized stat joins, no windows over
  * unbounded partitions, no driver loops.
  */
object Analytics {

  /** Cohort retention matrix: users are cohorted by the calendar day of
    * their FIRST event; for each (cohort, day_offset ≤ maxOffsetDays)
    * the distinct returning users and the retention rate vs the
    * cohort's day-0 size.
    *
    * Shape: one groupBy(user) for first-seen, one distinct over
    * (user, day), a user-keyed join, one grouped count-distinct, and a
    * broadcast of the per-cohort day-0 sizes (bounded by the calendar).
    * Every stage is keyed by user or (cohort, offset) — no corpus-wide
    * funnel. Output: (cohort, day_offset, n_users, retention). */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
      maxOffsetDays: Int): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays >= 0, got $maxOffsetDays")
    val first = df.groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("cohort"))
    val act = df.select(col(userCol), to_date(col(tsCol)).as("day")).distinct()
    val r = act.join(first, userCol)
      .select(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"),
        col(userCol))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort", "day_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
    val base = r.filter(col("day_offset") === 0)
      .select(col("cohort"), col("n_users").as("cohort_size"))
    r.join(broadcast(base), "cohort")
      .select(col("cohort"), col("day_offset"), col("n_users"),
        (round(col("n_users").cast("double")
          / col("cohort_size").cast("double"), 9) + lit(0.0)).as("retention"))
  }

  /** Ordered conversion funnel over `stages` (event-type values): a
    * user reaches stage i when their FIRST occurrence of every stage
    * ≤ i exists and the first-occurrence times are non-decreasing
    * (the strict "did the steps happen in order" reading). One
    * groupBy(user) computes all first-occurrence times; one global
    * aggregate counts each stage's reach — two shuffles total,
    * independent of the stage count.
    *
    * Output per stage: (stage_idx 1-based, stage, n_users,
    * conv_total = reach / stage-1 reach, conv_prev). */
  def funnelStages(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelStages needs at least one stage")
    val mins = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"__t$i")
    }
    val m = df.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    val reached: Seq[Column] = stages.indices
      .foldLeft(Vector.empty[Column]) { (acc, i) =>
        val here =
          if (i == 0) col("__t0").isNotNull
          else acc(i - 1) && col(s"__t$i").isNotNull &&
            col(s"__t${i - 1}") <= col(s"__t$i")
        acc :+ here
      }
    val counts = stages.indices.map(i =>
      sum(when(reached(i), 1L).otherwise(0L)).as(s"__s$i"))
    val agg = m.agg(counts.head, counts.tail: _*)
    def ratio(num: Column, den: Column): Column =
      round(when(den > 0, num.cast("double") / den.cast("double")), 9) + lit(0.0)
    val rows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(st).as("stage"),
        col(s"__s$i").as("n_users"),
        ratio(col(s"__s$i"), col("__s0")).as("conv_total"),
        ratio(col(s"__s$i"), col(s"__s${math.max(i - 1, 0)}")).as("conv_prev"))
    }
    agg.select(explode(array(rows: _*)).as("x")).select("x.*")
  }

  /** Population Stability Index of `valueCol` between the rows where
    * `refCond` holds (reference population) and the rest (current):
    * the reference's exact deciles (distributed Quantiles operator —
    * edges enter the plan as literals) bucket both populations, and
    * each bucket contributes (p_cur − p_ref)·ln(p_cur/p_ref); buckets
    * empty on either side contribute 0 (documented convention — the
    * alternative epsilon-clip distorts small buckets). One aggregation
    * pass over the data; the bucket spine is a 10-row literal range.
    *
    * Output per bucket: (bucket, n_ref, n_cur, p_ref, p_cur, psi_term);
    * sum(psi_term) is the PSI. */
  def psiReport(df: DataFrame, valueCol: String, refCond: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 100, s"buckets in [2,100], got $buckets")
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val edges = Quantiles.exactQuantiles(df.filter(refCond), valueCol, fracs)
    val v = col(valueCol).cast("double")
    val bucket = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + (v > lit(e)).cast("int")
    }
    val counted = df
      .select(bucket.as("bucket"), refCond.as("__ref"))
      .groupBy("bucket")
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("n_cur"))
    val spine = df.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
    val full = spine.join(counted, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = full.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    full.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        (round(col("n_ref").cast("double") / col("t_ref").cast("double"), 9)
          + lit(0.0)).as("p_ref"),
        (round(col("n_cur").cast("double") / col("t_cur").cast("double"), 9)
          + lit(0.0)).as("p_cur"),
        (round(when(col("n_ref") > 0 && col("n_cur") > 0,
          (col("n_cur").cast("double") / col("t_cur").cast("double")
            - col("n_ref").cast("double") / col("t_ref").cast("double"))
            * log(col("n_cur").cast("double") / col("t_cur").cast("double")
              / (col("n_ref").cast("double") / col("t_ref").cast("double"))))
          .otherwise(0.0), 9) + lit(0.0)).as("psi_term"))
  }
}
