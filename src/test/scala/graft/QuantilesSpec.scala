package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** Distributed exact quantiles: differential vs Spark's single-buffer
  * `percentile` aggregate (which is the semantics oracle, just not the
  * scale-safe plan) plus edge cases.
  */
class QuantilesSpec extends SparkSpec {

  private def builtin(df: org.apache.spark.sql.DataFrame, c: String, ps: Seq[Double]): Seq[Double] =
    df.agg(expr(s"percentile($c, array(${ps.mkString(",")}))"))
      .head.getSeq[Double](0)

  test("matches built-in percentile bit-for-bit on lineitem") {
    val li = Tables.lineitem(spark, sfDir)
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Quantiles.exactQuantiles(li, "l_quantity", ps)
    val want = builtin(li, "l_quantity", ps)
    got.zip(want).zip(ps).foreach { case ((g, w), p) =>
      assert(g == w, s"p=$p: got $g want $w")
    }
  }

  test("matches built-in on a column with interpolation between values") {
    val li = Tables.lineitem(spark, sfDir)
    val ps = Seq(0.33, 0.5, 0.667)
    val got = Quantiles.exactQuantiles(li, "l_extendedprice", ps)
    val want = builtin(li, "l_extendedprice", ps)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
  }

  test("excludes nulls and handles tiny inputs") {
    import spark.implicits._
    val df = Seq(Some(3.0), None, Some(1.0), Some(2.0)).toDF("v")
    assert(Quantiles.exactQuantiles(df, "v", Seq(0.5)) == Seq(2.0))
    val one = Seq(42.0).toDF("v")
    assert(Quantiles.exactQuantiles(one, "v", Seq(0.0, 0.5, 1.0)) == Seq(42.0, 42.0, 42.0))
  }

  test("randomized differential vs built-in percentile (12 trials)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(500)
      // duplicate-heavy, skewed, and negative values all appear
      val vals = Seq.fill(n)(rnd.nextInt(4) match {
        case 0 => rnd.nextInt(5).toDouble          // heavy ties
        case 1 => rnd.nextDouble() * 1e6           // large range
        case 2 => -rnd.nextDouble()                // negatives
        case _ => rnd.nextGaussian()
      })
      val df = vals.toDF("v").repartition(1 + rnd.nextInt(7))
      val ps = Seq(0.0, rnd.nextDouble(), 0.5, 1.0)
      val got = Quantiles.exactQuantiles(df, "v", ps)
      val want = builtin(df, "v", ps)
      got.zip(want).zip(ps).foreach { case ((g, w), p) =>
        // random fractions hit interpolation weights that aren't exactly
        // representable; allow last-ulp drift (1e-12 relative — three
        // orders tighter than the oracle gate's 1e-9)
        val tol = math.max(math.abs(w) * 1e-12, 1e-300)
        assert(math.abs(g - w) <= tol, s"trial $trial n=$n p=$p: got $g want $w")
      }
    }
  }

  test("multi-column one-pass agrees with built-in per column") {
    val li = Tables.lineitem(spark, sfDir)
    val specs = Seq("l_quantity" -> Seq(0.25, 0.5, 0.75),
      "l_extendedprice" -> Seq(0.1, 0.5, 0.9),
      "l_discount" -> Seq(0.5))
    val got = Quantiles.exactQuantilesMulti(li, specs)
    // ULP-level tolerance: Spark's builtin interpolates as
    // (1-w)*lo + w*hi while we pin DuckDB's lo + (hi-lo)*w (the
    // oracle-replayable form) — algebraically equal, one ULP apart.
    specs.foreach { case (c, ps) =>
      val want = builtin(li, c, ps)
      got(c).zip(want).zip(ps).foreach { case ((g, w), p) =>
        assert(math.abs(g - w) <= math.ulp(w) * 4, s"$c p=$p: got $g want $w")
      }
    }
  }

  test("groupedExactQuantiles matches the built-in grouped percentile bit for bit") {
    import spark.implicits._
    val ords = Tables.orders(spark, sfDir)
    val got = Quantiles.groupedExactQuantiles(
        ords, "o_orderstatus", "o_totalprice", Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val want = ords.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.25)").as("a"),
        expr("percentile(o_totalprice, 0.5)").as("b"),
        expr("percentile(o_totalprice, 0.9)").as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === want.keySet)
    got.keySet.foreach { k =>
      val (g1, g2, g3) = got(k); val (w1, w2, w3) = want(k)
      assert(math.abs(g1 - w1) <= math.ulp(w1) * 4, s"$k p25")
      assert(math.abs(g2 - w2) <= math.ulp(w2) * 4, s"$k p50")
      assert(math.abs(g3 - w3) <= math.ulp(w3) * 4, s"$k p90")
    }
    // single giant group degenerates to the global op
    val one = Quantiles.groupedExactQuantiles(
      ords.withColumn("g", lit("all")), "g", "o_totalprice", Seq(0.5))
    assert(one.count() === 1)
    assert(math.abs(one.head().getDouble(1) -
      Quantiles.exactMedian(ords, "o_totalprice")) < 1e-9)
  }

  test("quantile plans contain no unbounded percentile aggregate") {
    // The four rewired queries must never plan Spark's exact
    // percentile/median over a whole column (a TypedImperativeAggregate
    // buffering every value — the 100 TB scale-killer).
    val exactAgg = "(?<!approx_)percentile\\(|\\bmedian\\(".r
    Seq("q_quantiles", "q_describe", "q_quantile_approx", "q_cut_qcut").foreach { name =>
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(exactAgg.findFirstIn(p).isEmpty,
        s"$name still plans an unbounded exact percentile:\n$p")
    }
  }
}
