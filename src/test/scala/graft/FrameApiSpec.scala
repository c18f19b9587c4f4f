package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.{Frame, Series}

/** The user-facing Frame/Series facade, proven against the oracle-green
  * query registry: each test re-expresses a CORRECTNESS-gated registry
  * query through the facade and asserts identical results (same columns,
  * same rows). This is the "facade-vs-registry" equivalence the engine
  * ships on — a user composing `graft.api` gets the exact plans the
  * registry was value-checked with.
  */
class FrameApiSpec extends SparkSpec {

  private def fr(name: String): Frame = Frame(Tables.load(spark, sfDir, name))

  /** Facade result must equal the registry query's result: same columns,
    * same rows, doubles within 1e-9 relative (join-strategy changes can
    * reorder float summation by a last ulp — same tolerance as the
    * driver's hash gate, which rounds floats before hashing). */
  private def same(name: String, got: Frame): Unit = {
    val want = SparkEntry.queries(name)(spark, sfDir)
    assert(got.toDF.columns.toSeq == want.columns.toSeq,
      s"$name columns: ${got.toDF.columns.toSeq} vs ${want.columns.toSeq}")
    def key(r: org.apache.spark.sql.Row): String = r.toSeq.map {
      case d: Double => f"$d%.9e"
      case v => String.valueOf(v)
    }.mkString("|")
    val g = got.toDF.collect().map(key).sorted.toSeq
    val w = want.collect().map(key).sorted.toSeq
    assert(g == w, s"$name rows differ (facade ${g.size} vs registry ${w.size}): " +
      s"first diff ${g.zip(w).find(p => p._1 != p._2)}")
  }

  test("q1_pricing_summary via facade") {
    val li = fr("lineitem")
    same("q1_pricing_summary", li
      .filter(li("l_shipdate") <= java.sql.Timestamp.valueOf("1998-09-02 00:00:00"))
      .groupby("l_returnflag", "l_linestatus")
      .aggExpr(
        "sum_qty" -> Series(sum("l_quantity")),
        "sum_base_price" -> Series(sum("l_extendedprice")),
        "sum_disc_price" -> Series(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))),
        "sum_charge" -> Series(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))),
        "avg_qty" -> Series(avg("l_quantity")),
        "avg_price" -> Series(avg("l_extendedprice")),
        "avg_disc" -> Series(avg("l_discount")),
        "count_order" -> Series(count(lit(1))))
      .sortValues("l_returnflag", "l_linestatus"))
  }

  test("q_projection_filter via facade") {
    val li = fr("lineitem")
    same("q_projection_filter", li
      .filter(li("l_quantity") > 45 && li("l_discount") < 0.02)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .sortValues("l_orderkey", "l_linenumber"))
  }

  test("q_assign_arithmetic via facade") {
    val li = fr("lineitem")
    same("q_assign_arithmetic", li
      .filter(li("l_orderkey") < 2000)
      .assign(
        "disc_price" -> li("l_extendedprice") * (Series.lit_(1) - li("l_discount")),
        "charge" -> li("l_extendedprice") * (Series.lit_(1) - li("l_discount")) * (Series.lit_(1) + li("l_tax")),
        "qty_plus" -> (li("l_quantity") + li("l_linenumber")),
        "unit_price" -> li("l_extendedprice") / li("l_quantity"),
        "key_mod" -> li("l_orderkey") % 7,
        "qty_div5" -> li("l_quantity").floordiv(5),
        "disc_sq" -> li("l_discount") ** 2,
        "neg_tax" -> -li("l_tax"))
      .select("l_orderkey", "l_linenumber", "disc_price", "charge", "qty_plus",
        "unit_price", "key_mod", "qty_div5", "disc_sq", "neg_tax")
      .sortValues("l_orderkey", "l_linenumber"))
  }

  test("q_case_when via facade (eval)") {
    same("q_case_when", fr("lineitem")
      .eval("qty_bucket",
        "CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END")
      .groupby("qty_bucket")
      .aggExpr("n" -> Series(count(lit(1))), "total" -> Series(sum("l_extendedprice")))
      .sortValues("qty_bucket"))
  }

  test("q_isin_between via facade") {
    val li = fr("lineitem")
    same("q_isin_between", li
      .filter(li("l_returnflag").isin("R", "A") && li("l_quantity").between(10, 20))
      .groupby("l_returnflag").aggExpr("n" -> Series(count(lit(1))))
      .sortValues("l_returnflag"))
  }

  test("q_rename_drop via facade") {
    val o = fr("orders")
    same("q_rename_drop", o
      .filter(o("o_orderkey") < 3000)
      .rename("o_orderkey" -> "order_id", "o_totalprice" -> "total",
        "o_orderstatus" -> "status")
      .drop("o_custkey", "o_orderdate", "o_orderpriority")
      .sortValues("order_id"))
  }

  test("q_dropna via facade") {
    val ev = fr("events")
    same("q_dropna", ev
      .assign("value" -> Series(nullif(col("value"), lit(0.0))))
      .select("event_id", "value")
      .dropna(subset = Seq("value"))
      .sortValues("event_id").head(2000))
  }

  test("q_clip_where_mask via facade") {
    val li = fr("lineitem")
    same("q_clip_where_mask", li
      .filter(li("l_orderkey") < 1500)
      .assign(
        "qty_clipped" -> li("l_quantity").clip(5.0, 45.0),
        "big_disc" -> li("l_discount").where(li("l_discount") > 0.05, 0.0),
        "masked_tax" -> li("l_tax").mask(li("l_tax") > 0.04))
      .select("l_orderkey", "l_linenumber", "qty_clipped", "big_disc", "masked_tax")
      .sortValues("l_orderkey", "l_linenumber"))
  }

  test("q_astype_cast via facade") {
    val li = fr("lineitem")
    same("q_astype_cast", li
      .filter(li("l_orderkey") < 1000)
      .sortValues("l_orderkey", "l_linenumber")
      .assign(
        "qty_int" -> li("l_quantity").floor.astype("int"),
        "line_dbl" -> li("l_linenumber").astype("double"),
        "okey_str" -> li("l_orderkey").astype("string"),
        "ship_day" -> li("l_shipdate").astype("date"))
      .select("l_orderkey", "qty_int", "line_dbl", "okey_str", "ship_day"))
  }

  test("q_topk via facade") {
    same("q_topk", fr("lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .sortValuesBy("l_extendedprice" -> false, "l_orderkey" -> true, "l_linenumber" -> true)
      .head(50))
  }

  test("q_join_inner via facade merge") {
    val o = fr("orders"); val li = fr("lineitem")
    same("q_join_inner", o
      .filter(o("o_orderkey") < 1500)
      .transform(_.join(li.toDF, col("o_orderkey") === col("l_orderkey")))
      .select("o_orderkey", "o_totalprice", "l_linenumber", "l_extendedprice")
      .sortValues("o_orderkey", "l_linenumber"))
  }

  test("q_join_semi and q_join_anti via facade merge") {
    val c = fr("customer")
    val big = fr("orders").query("o_totalprice > 400000")
      .rename("o_custkey" -> "c_custkey")
    same("q_join_semi", c
      .merge(big, on = Seq("c_custkey"), how = "leftsemi")
      .select("c_custkey", "c_acctbal").sortValues("c_custkey"))
    same("q_join_anti", c
      .merge(big, on = Seq("c_custkey"), how = "leftanti")
      .select("c_custkey", "c_mktsegment").sortValues("c_custkey"))
  }

  test("q_join_broadcast_star via facade merge") {
    same("q_join_broadcast_star", fr("customer")
      .rename("c_nationkey" -> "n_nationkey")
      .merge(fr("nation"), on = Seq("n_nationkey"))
      .rename("n_regionkey" -> "r_regionkey")
      .merge(fr("region"), on = Seq("r_regionkey"))
      .assign("region" -> Series("r_name"), "nation" -> Series("n_name"))
      .groupby("region", "nation")
      .aggExpr("n_customers" -> Series(count(lit(1))),
        "total_bal" -> Series(sum("c_acctbal")))
      .sortValues("region", "nation"))
  }

  test("q_groupby_firstlast via facade") {
    same("q_groupby_firstlast", fr("events")
      .groupby("event_type")
      .aggExpr(
        "idxmin_ev" -> Series(min_by(col("event_id"), col("value"))),
        "idxmax_ev" -> Series(max_by(col("event_id"), col("value"))),
        "first_value" -> Series(min_by(col("value"), col("event_id"))),
        "last_value" -> Series(max_by(col("value"), col("event_id"))))
      .sortValues("event_type"))
  }

  test("q_value_counts via facade") {
    same("q_value_counts", fr("orders").valueCounts("o_orderpriority", normalize = true))
  }

  test("q_group_head via facade") {
    same("q_group_head", fr("orders")
      .groupby("o_custkey").head(2, "o_orderdate", "o_orderkey")
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .sortValues("o_custkey", "o_orderdate", "o_orderkey"))
  }

  test("q_cumulative via facade") {
    val ev = fr("events")
    same("q_cumulative", ev
      .filter(ev("user_id") < 20)
      .groupby("user_id")
      .cumulative("cum_sum", "sum", "value", "ts", "event_id")
      .groupby("user_id").cumulative("cum_max", "max", "value", "ts", "event_id")
      .groupby("user_id").cumulative("cum_min", "min", "value", "ts", "event_id")
      .groupby("user_id").cumulative("cum_count", "count", "value", "ts", "event_id")
      .select("event_id", "user_id", "cum_sum", "cum_max", "cum_min", "cum_count")
      .sortValues("event_id"))
  }

  test("q_rolling_rows via facade") {
    val ev = fr("events")
    same("q_rolling_rows", ev
      .filter(ev("user_id") < 10)
      .rolling(3, order = Seq("ts", "event_id"), by = Seq("user_id"))
      .mean("value", "roll_avg").sum("value", "roll_sum")
      .min("value", "roll_min").max("value", "roll_max").count("roll_n")
      .toFrame
      .select("event_id", "user_id", "roll_avg", "roll_sum", "roll_min", "roll_max", "roll_n")
      .sortValues("event_id"))
  }

  test("q_rolling_skew via facade (pandas sample skew/kurt)") {
    val ev = fr("events")
    same("q_rolling_skew", ev
      .filter(ev("user_id") < 10)
      .rolling(5, order = Seq("ts", "event_id"), by = Seq("user_id"))
      .skew("value", "roll_skew").kurt("value", "roll_kurt")
      .toFrame
      .transform(_.select(col("event_id"),
        (round(col("roll_skew"), 9) + lit(0.0)).as("roll_skew"),
        (round(col("roll_kurt"), 9) + lit(0.0)).as("roll_kurt")))
      .sortValues("event_id"))
  }

  test("q_resample_daily via facade") {
    same("q_resample_daily", fr("events")
      .resample("1 day", on = "ts")
      .aggExpr(
        "n" -> Series(count(lit(1))), "total" -> Series(sum("value")),
        "mean" -> Series(avg("value")),
        "open" -> Series(min_by(col("value"), col("event_id"))),
        "high" -> Series(max("value")), "low" -> Series(min("value")),
        "close" -> Series(max_by(col("value"), col("event_id"))))
      .rename("ts_bucket" -> "day")
      .select("day", "n", "total", "mean", "open", "high", "low", "close")
      .sortValues("day"))
  }

  test("q_merge_asof_backward via facade") {
    val ev = fr("events")
    val clicks = ev.filter(ev("event_type") === "click")
      .select("event_id", "ts", "user_id", "value")
    val purchases = ev.filter(ev("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
      .rename("event_id" -> "purchase_id", "value" -> "purchase_value")
    same("q_merge_asof_backward", clicks
      .mergeAsof(purchases, on = "ts", by = Seq("user_id"))
      .select("event_id", "user_id", "value", "purchase_id", "purchase_value")
      .sortValues("event_id"))
  }

  test("q_explode_words via facade") {
    val d = fr("documents")
    same("q_explode_words", d
      .assign("words" -> d("text").str.split(" "))
      .explode("words", as = "word")
      .select("word")
      .filter(Series("word") =!= "")
      .groupby("word").aggExpr("cnt" -> Series(count(lit(1))))
      .sortValuesBy("cnt" -> false, "word" -> true)
      .head(100))
  }

  test("q_str_basic via facade str accessor") {
    val p = fr("part")
    same("q_str_basic", p
      .filter(p("p_partkey") < 2000)
      .assign(
        "up" -> p("p_name").str.upper,
        "lo" -> p("p_brand").str.lower,
        "len" -> p("p_name").str.len,
        "pre" -> p("p_name").str.slice(0, 8),
        "padded" -> p("p_brand").str.rjust(12, "_"),
        "trimmed" -> p("p_brand").str.rjust(12, " ").str.strip,
        "has_a" -> p("p_name").str.contains("a"),
        "std" -> p("p_type").str.startswith("STANDARD"),
        "joined" -> p("p_name").str.cat(col("p_brand"), "/"),
        "dashed" -> p("p_type").str.replace(" ", "-"),
        "rev" -> p("p_brand").str.reverse,
        "rep" -> p("p_brand").str.repeat(2))
      .select("p_partkey", "up", "lo", "len", "pre", "padded", "trimmed",
        "has_a", "std", "joined", "dashed", "rev", "rep")
      .sortValues("p_partkey"))
  }

  test("q_dt_parts via facade dt accessor") {
    val o = fr("orders")
    same("q_dt_parts", o
      .assign("y" -> o("o_orderdate").dt.year, "m" -> o("o_orderdate").dt.month)
      .groupby("y", "m")
      .aggExpr("n" -> Series(count(lit(1))),
        "min_day" -> Series(min(dayofmonth(col("o_orderdate")))),
        "max_q" -> Series(max(quarter(col("o_orderdate")))),
        "min_doy" -> Series(min(dayofyear(col("o_orderdate")))),
        "max_wd" -> Series(max(weekday(col("o_orderdate")) + 1)))
      .sortValues("y", "m"))
  }

  test("q_quantiles via facade quantile()") {
    val li = fr("lineitem")
    val want = SparkEntry.queries("q_quantiles")(spark, sfDir).head()
    val got = li.quantile("l_quantity", Seq(0.25, 0.5, 0.75)) :+ li.median("l_extendedprice")
    assert(got == Seq(want.getDouble(0), want.getDouble(1), want.getDouble(2), want.getDouble(3)))
  }

  test("q_describe via facade describe()") {
    val got = Frame(Tables.events(spark, sfDir)).describe("value")
    val want = SparkEntry.queries("q_describe")(spark, sfDir)
    assert(got.columns.toSeq == want.columns.toSeq)
    assert(got.collect().map(_.toString).toSeq == want.collect().map(_.toString).toSeq)
  }

  test("locRange prunes via pushed index filter; loc point lookup works") {
    val o = fr("orders").setIndex("o_orderkey")
    val sliced = o.locRange(100L, 200L)
    val p = sliced.toDF.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThanOrEqual(o_orderkey") || p.contains("IsNotNull(o_orderkey")),
      s"index slice filter not pushed to scan:\n$p")
    val want = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey").between(100L, 200L)).count()
    assert(sliced.count() == want)
    assert(o.loc(150L).count() ==
      Tables.orders(spark, sfDir).filter(col("o_orderkey") === 150L).count())
  }

  test("mergeOn joins differently-named keys, keeping both columns") {
    val c = fr("customer").select("c_custkey", "c_name")
    val o = fr("orders").select("o_orderkey", "o_custkey")
    val j = c.mergeOn(o, leftOn = Seq("c_custkey"), rightOn = Seq("o_custkey"))
    assert(j.columns == Seq("c_custkey", "c_name", "o_orderkey", "o_custkey"))
    val want = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .count()
    assert(j.count() == want)
    // left join keeps unmatched left rows
    val lj = c.mergeOn(o, Seq("c_custkey"), Seq("o_custkey"), how = "left")
    assert(lj.count() >= j.count())
  }

  test("q_pivot via facade pivotTable") {
    val o = fr("orders")
    same("q_pivot", o
      .assign("y" -> o("o_orderdate").dt.year)
      .pivotTable(index = "y", columns = "o_orderstatus", values = "o_totalprice",
        aggFn = "sum", pivotValues = Seq("F", "O", "P"))
      .sortValues("y"))
  }

  test("q_melt via facade melt") {
    val o = fr("orders")
    same("q_melt", o
      .filter(o("o_orderkey") < 1000)
      .assign("o_custkey" -> o("o_custkey").astype("double"))
      .melt(ids = Seq("o_orderkey"),
        values = Seq("o_totalprice" -> "totalprice", "o_custkey" -> "custkey"),
        varName = "var", valueName = "val")
      .sortValues("o_orderkey", "var"))
  }

  test("q_concat_cols via facade concatCols") {
    val a = fr("orders").rename("o_custkey" -> "k")
      .groupby("k").aggNamed(("n_orders", "size", "k"))
    val b = fr("customer").query("c_custkey < 700").rename("c_custkey" -> "k")
      .groupby("k").aggNamed(("total_bal", "sum", "c_acctbal"))
    same("q_concat_cols", a.concatCols(b, on = "k")
      .rename("k" -> "custkey")
      .sortValues("custkey"))
  }

  test("q_cut_qcut via facade cut/qcut building blocks") {
    val o = fr("orders")
    same("q_cut_qcut", o
      .assign("price_bin" -> Series(least(floor(col("o_totalprice") / 100000), lit(5)).cast("long")))
      .qcut("o_totalprice", 4, as = "quartile")
      .groupby("price_bin", "quartile")
      .aggExpr("n" -> Series(count(lit(1))))
      .sortValues("price_bin", "quartile"))
  }

  test("q_sample_hash via facade sampleByHash") {
    same("q_sample_hash", fr("orders")
      .sampleByHash("o_orderkey", 26.0 / 256)
      .select("o_orderkey", "o_totalprice")
      .sortValues("o_orderkey"))
  }

  test("categorize fails fast past maxCategories") {
    val o = fr("orders")
    val e = intercept[IllegalArgumentException] {
      o.categorize("o_orderkey", maxCategories = 10)
    }
    assert(e.getMessage.contains("over 10 distinct values"))
  }

  test("categorize gives null values code -1 (pandas NaN convention)") {
    import spark.implicits._
    val f = Frame(Seq((1L, "a"), (2L, null), (3L, "b"), (4L, "a"))
      .toDF("id", "v"))
    val got = f.categorize("v").df.select("id", "v_code").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(got.toSeq == Seq(1L -> 0, 2L -> -1, 3L -> 1, 4L -> 0))
  }

  test("asKnown pins categories; categorize reuses them; asUnknown drops them") {
    val o = fr("orders").select("o_orderkey", "o_orderpriority")
    val known = o.asKnown("o_orderpriority", ordered = true)
    val cats = known.knownCategories("o_orderpriority").get
    assert(cats == cats.sorted && cats.nonEmpty)
    assert(known.catKnown("o_orderpriority") && known.catOrdered("o_orderpriority"))
    // codes from the pinned dictionary match fresh discovery exactly
    val viaKnown = known.categorize("o_orderpriority").df
      .select("o_orderkey", "o_orderpriority_code").orderBy("o_orderkey").collect()
    val viaFresh = o.categorize("o_orderpriority").df
      .select("o_orderkey", "o_orderpriority_code").orderBy("o_orderkey").collect()
    assert(viaKnown.sameElements(viaFresh))
    val dropped = known.asUnknown("o_orderpriority")
    assert(!dropped.catKnown("o_orderpriority") && !dropped.catOrdered("o_orderpriority"))
    assert(dropped.knownCategories("o_orderpriority").isEmpty)
  }

  test("pandas-shape conveniences: shape/info/join/idxmax/isna/agg tail") {
    import spark.implicits._
    val o = fr("orders")
    val (rows, cols) = o.shape
    assert(rows > 0 && cols == o.columns.length && o.ndim == 2)
    assert(o.sizeAll == rows * cols)
    assert(o.info.contains("o_orderkey") && o.info.contains("partitions"))
    // join = merge on key
    val n = fr("nation").select("n_nationkey", "n_name")
    val joined = fr("customer").select("c_custkey", "c_nationkey")
      .join(n.rename("n_nationkey" -> "c_nationkey"), on = "c_nationkey")
    assert(joined.columns.contains("n_name"))
    // idxmax/idxmin with deterministic tie-break on the index
    val f = Frame(Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0)).toDF("id", "v"))
      .setIndex("id")
    assert(f.idxmax("v") == 2L && f.idxmin("v") == 4L)
    // isna mask
    val m = Frame(Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v")).isna
    assert(m.df.orderBy("id").collect().map(_.getBoolean(1)).toSeq == Seq(false, true))
    // groupby agg tail: prod/sem/skew/kurt produce finite values
    val g = Frame(Seq(("a", 2.0), ("a", -3.0), ("a", 4.0), ("b", 5.0), ("b", 0.0))
      .toDF("k", "v"))
      .groupby("k").agg("v" -> "prod", "v" -> "sem")
      .df.orderBy("k").collect()
    assert(math.abs(g(0).getDouble(1) - -24.0) < 1e-9) // 2 * -3 * 4 (exp-sum-log)
    assert(g(1).getDouble(1) == 0.0)   // zero-bearing group
    assert(!g(0).isNullAt(2))
    // pandas empty-product convention: an all-null group yields 1.0
    val gn = Frame(Seq(("a", Some(2.0)), ("b", Option.empty[Double]))
      .toDF("k", "v"))
      .groupby("k").agg("v" -> "prod")
      .df.orderBy("k").collect()
    assert(gn(0).getDouble(1) == 2.0 && gn(1).getDouble(1) == 1.0)
  }

  test("astype(\"category\") pins the dictionary like asKnown") {
    val o = fr("orders").astype("o_orderpriority" -> "category")
    assert(o.catKnown("o_orderpriority"))
    assert(o.knownCategories("o_orderpriority").get.nonEmpty)
  }

  test("asKnown requires a string column and respects the cap") {
    val o = fr("orders")
    intercept[IllegalArgumentException](o.asKnown("o_orderkey"))
    intercept[IllegalArgumentException](
      o.asKnown("o_orderpriority", maxCategories = 2))
  }

  test("q_categorical_codes via facade categorize (dynamic dictionary)") {
    val o = fr("orders")
    same("q_categorical_codes", o
      .filter(o("o_orderkey") < 1000)
      .select("o_orderkey", "o_orderpriority")
      .categorize("o_orderpriority")
      .rename("o_orderpriority_code" -> "code")
      .select("o_orderkey", "o_orderpriority", "code")
      .sortValues("o_orderkey"))
  }

  test("repartitionByFreq lays out one time bucket per partition") {
    val ev = Frame(Tables.events(spark, sfDir)).repartitionByFreq("ts", "day")
    val perPart = ev.toDF
      .select(spark_partition_id().as("pid"), date_trunc("day", col("ts")).as("d"))
      .distinct().groupBy("pid").count().collect()
    // each partition hosts at most one distinct day (empty ones aside)
    assert(perPart.forall(_.getLong(1) >= 1))
    val dayToPids = ev.toDF
      .select(date_trunc("day", col("ts")).as("d"), spark_partition_id().as("pid"))
      .distinct().groupBy("d").count().collect()
    assert(dayToPids.forall(_.getLong(1) == 1), "a day split across partitions")
  }

  test("str.extractall yields per-match capture groups for explode") {
    import spark.implicits._
    val f = Frame(Seq((1L, "a1 b2 c33")).toDF("id", "s"))
    val rows = f.assign("m" -> f("s").str.extractall("([a-z])([0-9]+)", groups = 2))
      .explode("m", as = "hit")
      .toDF.select("hit.group_1", "hit.group_2")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("a", "1"), ("b", "2"), ("c", "33")))
  }

  test("enforceIndexBounds passes in-bounds data and throws out of bounds") {
    val o = Frame(Tables.orders(spark, sfDir)).setIndex("o_orderkey")
    val maxKey = Tables.orders(spark, sfDir)
      .agg(max("o_orderkey")).head().getLong(0)
    assert(o.enforceIndexBounds(0L, maxKey).count() == o.count())
    val ex = intercept[Exception] {
      o.enforceIndexBounds(0L, maxKey - 1).count()
    }
    assert(ex.getMessage.contains("divisions") ||
      Option(ex.getCause).exists(_.getMessage.contains("divisions")))
  }

  test("to_timedelta seconds composes with timestamp arithmetic") {
    import graft.api.DtOps
    val ev = Frame(Tables.events(spark, sfDir)).head(10)
    val shifted = ev.assign(
        "later" -> Series(col("ts") + DtOps.toTimedeltaSeconds(Series.lit_(90)).col))
      .toDF.select(unix_micros(col("later")) - unix_micros(col("ts")))
      .collect().map(_.getLong(0))
    assert(shifted.forall(_ == 90L * 1000000))
  }

  test("iloc / selectDtypes / pipe / pop / squeeze / renameAxis") {
    val o = fr("orders")
    assert(o.iloc(Seq(0, 2)).columns == Seq(o.columns(0), o.columns(2)))
    val numeric = o.selectDtypes("bigint", "double").columns
    assert(numeric.contains("o_orderkey") && numeric.contains("o_totalprice")
      && !numeric.contains("o_orderpriority"))
    val piped = o.pipe(_.select("o_orderkey")).pipe(_.head(3))
    assert(piped.count() == 3 && piped.columns == Seq("o_orderkey"))
    val (popped, rest) = o.pop("o_orderpriority")
    assert(!rest.columns.contains("o_orderpriority"))
    assert(popped.col != null)
    assert(o.select("o_orderkey").squeeze.col != null)
    intercept[IllegalArgumentException](o.squeeze)
    val renamed = o.setIndex("o_orderkey").renameAxis("idx")
    assert(renamed.columns.contains("idx") && !renamed.columns.contains("o_orderkey"))
    intercept[IllegalStateException](o.renameAxis("x"))
  }

  test("repartitionBySize targets a partition byte size from plan stats") {
    val li = fr("lineitem")
    val est = li.toDF.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    // target = est/8 → ~8 partitions (ceil division, bounded below by 1)
    val n8 = li.repartitionBySize(math.max(est / 8, 1)).toDF.rdd.getNumPartitions
    assert(n8 >= 8 && n8 <= 9, s"expected ~8 partitions, got $n8")
    val n1 = li.repartitionBySize(est * 2 + 1).toDF.rdd.getNumPartitions
    assert(n1 == 1)
    intercept[IllegalArgumentException](li.repartitionBySize(0))
  }

  test("setIndex supports tail and keep-first/last dedup") {
    val ev = Frame(Tables.events(spark, sfDir)).setIndex("event_id")
    val t = ev.tail(5).toDF.collect().map(_.getLong(0))
    val want = Tables.events(spark, sfDir).orderBy(col("event_id").desc)
      .limit(5).orderBy("event_id").collect().map(_.getLong(0))
    assert(t.toSeq == want.toSeq)
    val first = ev.dropDuplicates(Seq("user_id"), keepRow = "first")
    val perUser = first.toDF.groupBy("user_id").count()
      .filter(col("count") > 1).count()
    assert(perUser == 0)
    // keep-first must pick the smallest event_id per user
    val got = first.toDF.select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantMin = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(min("event_id").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == wantMin)
  }

  test("training-prep ops on the facade match the registry queries") {
    val docs = fr("documents").setIndex("doc_id")
    // near-dup pairs via facade == q_near_dup_minhash (ordered identically)
    same("q_near_dup_minhash",
      docs.nearDuplicates("text").sortValues("doc_a", "doc_b"))
    // packing via facade == the registry's per-bin summary
    same("q_pack_sequences", docs
      .assign("n_tokens" -> Series(size(split(col("text"), " "))))
      .select("doc_id", "n_tokens")
      .setIndex("doc_id")
      .packSequences("n_tokens", 2048L)
      .groupby("bin").aggNamed(("n_docs", "count", "n_tokens"),
        ("total_tokens", "sum", "n_tokens"),
        ("first_doc", "min", "doc_id"), ("last_doc", "max", "doc_id"))
      .sortValues("bin"))
    // exact dedup keeps one row per distinct text, smallest id
    val deduped = docs.dedupExact("text")
    assert(deduped.toDF.count() ==
      Tables.documents(spark, sfDir).select("text").distinct().count())
  }

  test("facade diagnostics expose staged plans and runtime metrics") {
    val f = fr("lineitem").groupby("l_returnflag").sum("l_quantity")
    assert(f.explainStages.map(_._1) ==
      Seq("parsed", "analyzed", "optimized", "physical"))
    val stats = f.analyze
    assert(stats.exists { case (_, n, m) =>
      n.contains("HashAggregate") && m.getOrElse("numOutputRows", 0L) > 0L })
  }

  test("facade winsorize reproduces the registry's clipped means") {
    // exact mode compares against the registry's quantile_cont oracle;
    // the default approx mode is the scale path (bounded sketch buffer)
    val approxN = fr("events").winsorize("value", "event_type").toDF
      .filter(col("value") =!= col("value_winsorized")).count()
    assert(approxN > 0)
    val got = fr("events").winsorize("value", "event_type", exact = true).toDF
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") =!= col("value_winsorized"), 1).otherwise(0)).as("nc"),
        round(avg("value_winsorized"), 9).as("mw"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val want = SparkEntry.queries("q_winsorize")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == want)
  }

  test("quality/mixing ops on the facade match the registry queries") {
    val docs = fr("documents").setIndex("doc_id")
    same("q_bigram_lm", docs.bigramLmScore("text").sortValues("doc_id"))
    same("q_source_overlap",
      docs.groupOverlap("source", "text").sortValues("src_a", "src_b"))
    // chunking via facade == the registry's digest-checked summary
    same("q_chunk_sliding", docs.chunkText("text", 32, 16)
      .groupby("doc_id").aggExpr(
        ("n_chunks", Series(count(lit(1)))),
        ("chunk_tokens", Series(sum("n_tokens"))),
        ("chunks_digest", Series(md5(array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          x => x.getField("chunk_text")), "|").cast("binary")))))
      .sortValues("doc_id"))
    // budget-mix `keep` marks reproduce the registry's kept counts
    val marked = docs
      .assign("n_tokens" -> Series(size(split(col("text"), " "))))
      .tokenBudgetMix("source", "n_tokens", 800L)
    val got = marked.toDF.filter(col("keep"))
      .groupBy("source")
      .agg(count(lit(1)).as("kd"), sum("n_tokens").as("kt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = SparkEntry.queries("q_token_budget_mix")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
  }

  test("medianApproximate(method=tdigest) agrees with exact quantiles") {
    val li = fr("lineitem")
    val exact = li.median("l_extendedprice")
    // global: both sketch methods within 5% of exact (the same gate
    // q_tdigest_quantile ships with; tight rank bounds live in
    // TDigestSpec)
    for (m <- Seq("dask", "tdigest")) {
      val approx = li.medianApproximate("l_extendedprice", m)
      assert(math.abs(approx - exact) <= exact * 0.05, s"method=$m: $approx vs $exact")
    }
    val Seq(t50, t99) =
      li.quantileApproximate("l_extendedprice", Seq(0.5, 0.99), "tdigest")
    val Seq(e50, e99) = li.quantile("l_extendedprice", Seq(0.5, 0.99))
    assert(math.abs(t50 - e50) <= e50 * 0.05)
    assert(math.abs(t99 - e99) <= e99 * 0.05)
    // grouped: per-group t-digest sketches vs per-group exact percentile
    val byFlag = li.groupby("l_returnflag")
      .medianApproximate("l_extendedprice", "tdigest").toDF
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exactByFlag = li.groupby("l_returnflag").median("l_extendedprice").toDF
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byFlag.keySet == exactByFlag.keySet)
    exactByFlag.foreach { case (k, e) =>
      assert(math.abs(byFlag(k) - e) <= math.abs(e) * 0.05, s"group $k") }
    intercept[IllegalArgumentException] {
      li.medianApproximate("l_extendedprice", "nope")
    }
  }

  test("q_token_count_bpe and q_pii_redact via facade") {
    same("q_token_count_bpe", Frame(Tables.documents(spark, sfDir))
      .tokenCountBpe("text")
      .transform(_.select("doc_id", "n_tokens_bpe").orderBy("doc_id")))
    // the registry's synthetic PII-bearing text, replayed
    val synth = Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(lit("ping user"), col("doc_id").cast("string"),
        lit("@mail-"), (col("doc_id") % 7).cast("string"),
        lit(".com from 10."), (col("doc_id") % 200).cast("string"),
        lit(".3.4 tel +1 555-010-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" "), substring(col("text"), 1, 40)).as("text"))
    same("q_pii_redact", Frame(synth, Some("doc_id")).redactPii("text")
      .transform(_.orderBy("doc_id")))
  }

  test("perceptual near-dup facades equal the operator pipelines") {
    import spark.implicits._
    import graft.operators.{AudioDedup, ImageDedup, Multimodal}
    def collectPairs(df: DataFrame): Set[(Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // image: same fixture family as ImageDedupSpec
    val imgs = (0 until 100).map { d =>
      val grp = d % 10; val vr = d / 10
      (d.toLong, ImageDedup.bmpFixture(9, 8, (x, y) => {
        val p = if ((x * 3 + y * 5 + vr * 7) % 11 == 0) 128 else 0
        ((grp * 73 + x * 29 + y * 19 + p) % 256,
          (grp * 59 + x * 31 + y * 13 + p) % 256,
          (grp * 41 + x * 23 + y * 17 + p) % 256)
      }))
    }.toDF("doc_id", "payload")
    val wantI = collectPairs(ImageDedup.imageNearDuplicates(
      ImageDedup.dHashes(imgs, "doc_id", "payload"), "doc_id", "dhash", 8))
    assert(wantI.nonEmpty)
    assert(collectPairs(Frame(imgs, Some("doc_id"))
      .imageNearDuplicates("payload").toDF) === wantI)
    // audio: same fixture family as AudioDedupSpec
    val wavs = (0 until 100).map { d =>
      val grp = d % 10; val vr = d / 10
      val data = Array.tabulate(260) { i =>
        val base = (((grp + 7).toLong * (i + 13) * 2654435761L) % 4294967296L) / 16777216L
        val p = if ((i * 7 + vr * 11) % 17 == 0) 24 else 0
        ((base + p) % 256).toByte
      }
      (d.toLong, Multimodal.wavFixture(8000, 1, 8, 260) ++ data)
    }.toDF("doc_id", "payload")
    val wantA = collectPairs(AudioDedup.audioNearDuplicates(
      AudioDedup.fingerprints(wavs, "doc_id", "payload"), "doc_id", "afp", 6))
    assert(wantA.nonEmpty)
    assert(collectPairs(Frame(wavs, Some("doc_id"))
      .audioNearDuplicates("payload").toDF) === wantA)
  }

  test("extractHtml / frequentTokens facades match the registry queries") {
    val d = Tables.documents(spark, sfDir)
    // page synthesis SHARED with the registry query — a copy here would
    // let the two inputs drift while this spec kept passing
    val page = CorpusQueries.htmlPage
    same("q_html_extract", Frame(d.select(col("doc_id"), page.as("html")),
        Some("doc_id"))
      .extractHtml("html", linkDensityMax = 0.05)
      .sortValues("doc_id"))
    same("q_frequent_items", Frame(d)
      .frequentTokens("text", 2, 1000, k = 512)
      .transform(_.orderBy(col("cnt").desc, col("token"))))
  }

  test("ewm / asfreqFfill facades match the registry queries") {
    val ev = fr("events")
    same("q_ewm", ev
      .filter(ev("user_id") < 10)
      .transform(_.select("user_id", "ts", "event_id", "value"))
      .ewm("user_id", Seq("ts", "event_id"), "value", alpha = 0.2)
      .transform(_.select(col("event_id"), round(col("ewm"), 9).as("ewm")))
      .sortValues("event_id"))
    val ev2 = fr("events")
    same("q_asfreq_ffill", ev2
      .filter(ev2("user_id") < 6)
      .asfreqFfill("user_id", "ts", "value", "event_id", unit = "day")
      .sortValues("user_id", "bucket"))
  }

  test("ewmVar facade matches the registry query") {
    val ev = fr("events")
    same("q_ewm_var", ev
      .filter(ev("user_id") < 10)
      .transform(_.select("user_id", "ts", "event_id", "value"))
      .ewmVar("user_id", Seq("ts", "event_id"), "value", alpha = 0.2)
      .transform(_.select(col("event_id"),
        (round(col("ewm_var"), 9) + lit(0.0)).as("ewm_var"),
        (round(col("ewm_std"), 9) + lit(0.0)).as("ewm_std")))
      .sortValues("event_id"))
  }

  test("prefixFilterPairs / cdcDedupReport facades match the registry queries") {
    same("q_prefix_filter_join", Frame(Tables.documents(spark, sfDir),
        Some("doc_id"))
      .prefixFilterPairs("text", threshold = 0.6)
      .sortValues("id_a", "id_b"))
    same("q_cdc_chunks", Frame(Tables.documents(spark, sfDir),
        Some("doc_id"))
      .cdcDedupReport("text", maskBits = 5)
      .transform(_.withColumnRenamed("id", "doc_id").orderBy("doc_id")))
  }

  test("cohortRetention / funnel / psiReport facades match the registry queries") {
    same("q_cohort_retention", fr("events")
      .cohortRetention("user_id", "ts", maxOffsetDays = 7)
      .sortValues("cohort", "day_offset"))
    same("q_funnel", fr("events")
      .funnel("user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .sortValues("stage_idx"))
    same("q_psi_drift", fr("events")
      .psiReport("value", col("ts") < lit("2024-01-16").cast("timestamp"))
      .sortValues("bucket"))
  }

  test("sessionPattern facade matches the registry query") {
    val ev = fr("events")
    same("q_session_pattern", ev
      .filter(ev("user_id") < 10)
      .sessionPattern("user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"))
      .sortValues("user_id", "session_id"))
  }

  test("parseUrls / dedupConsecutiveLines / tokenizeBpe facades match the registry queries") {
    val d = Tables.documents(spark, sfDir)
    val synthUrl = concat(
      lit("HTTPS://"),
      when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
      lit("Site"), (col("doc_id") % 50).cast("string"), lit("."),
      element_at(typedLit(Seq("com", "org", "net")),
        (col("doc_id") % 3 + 1).cast("int")),
      lit("/docs/"), col("doc_id").cast("string"),
      when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
      lit("?id="), col("doc_id").cast("string"), lit("&utm_source=feed"),
      when(col("doc_id") % 2 === 0, lit("&ref=abc")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
    same("q_url_parse", Frame(d.select(col("doc_id"), synthUrl.as("url")),
        Some("doc_id"))
      .parseUrls("url")
      .transform(_.drop("url"))
      .sortValues("doc_id"))
    // sampleNPerGroup: exact-size groups, deterministic under layout
    locally {
      val s1 = Frame(d, Some("doc_id")).sampleNPerGroup("lang", 5)
      val sizes = s1.toDF.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val avail = d.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sizes == avail.map { case (l, c) => l -> math.min(5L, c) })
      val s2 = Frame(d.repartition(7), Some("doc_id"))
        .sampleNPerGroup("lang", 5)
      assert(s1.toDF.collect().map(_.toSeq).toSet ==
        s2.toDF.collect().map(_.toSeq).toSet)
    }
    locally {
      val wsa = col("__ws")
      val nLines = ceil(size(wsa) / lit(6.0)).cast("int")
      val lines = transform(sequence(lit(0), nLines - 1), i =>
        concat(array_join(slice(wsa, i * 6 + 1, lit(6)), " "),
          when((col("doc_id") + i) % 7 === 0, lit(" javascript."))
            .when((col("doc_id") + i) % 3 === 0, lit(""))
            .otherwise(lit("."))))
      same("q_c4_line_filter", Frame(
          d.select(col("doc_id"), split(col("text"), " ").as("__ws"))
            .select(col("doc_id"), array_join(lines, "\n").as("ltext")),
          Some("doc_id"))
        .c4FilterLines("ltext", minWords = 5, blocked = Seq("javascript"))
        .sortValues("doc_id"))
    }
    same("q_badwords", Frame(d, Some("doc_id"))
      .flagBlockedWords("text", Seq("slow", "dup"))
      .sortValues("doc_id"))
    same("q_script_detect", Frame(
        d.select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 1,
              concat(lit(" "), repeat(lit("привет мир "),
                ((col("n_chars") / 10).cast("int") + 1))))
            .when(col("doc_id") % 3 === 2,
              concat(lit(" "), repeat(lit("漢字文本 "),
                ((col("n_chars") / 4).cast("int") + 1))))
            .otherwise(lit(""))).as("mtext")),
        Some("doc_id"))
      .scriptProfile("mtext")
      .sortValues("doc_id"))
    same("q_blocklist", Frame(
        d.select(col("doc_id"),
          lower(regexp_extract(synthUrl, "://([^/?#]*)", 1)).as("host")),
        Some("doc_id"))
      .filterBlockedHosts("host", Frame {
        import spark.implicits._
        Seq("site9.com", "site10.net", "site11.org", "site0.com").toDF("host")
      })
      .sortValues("doc_id"))
    same("q_domain_cap", Frame(
        d.select(col("doc_id"), col("n_chars"), synthUrl.as("url")),
        Some("doc_id"))
      .parseUrls("url")
      .capPerDomain("domain", "n_chars", cap = 2)
      .transform(_.orderBy("domain", "rn")))
    val doubled = d.select(col("doc_id"),
      array_join(
        flatten(transform(split(col("text"), "\\. "), x => array(x, x))),
        "\n").as("text"))
    same("q_line_dedup_consecutive", Frame(doubled, Some("doc_id"))
      .dedupConsecutiveLines("text")
      .sortValues("doc_id"))
    same("q_bpe_tokenize", Frame(d, Some("doc_id"))
      .tokenizeBpe("text")
      .transform(_.select(col("doc_id"),
        array_join(col("bpe_pieces"), "|").as("pieces_str"),
        size(col("bpe_pieces")).cast("long").as("n_pieces")))
      .sortValues("doc_id"))
    def link(off: Int) = d.select((col("doc_id") % 40).as("src"),
      ((col("doc_id") * 17 + off) % 40).as("dst"))
    same("q_pagerank", Frame(link(13).unionByName(link(26)))
      .pageRank("src", "dst", iters = 5, damping = 0.85)
      .transform(_.select(col("node"), round(col("pr"), 6).as("pr"))
        .orderBy("node")))
    same("q_winnow_overlap", Frame(d, Some("doc_id"))
      .winnowOverlap("text", k = 3, w = 4, minShared = 3L)
      .transform(_.orderBy("doc_a", "doc_b")))
    // unigram-LM facade: train + segment line up with the operator
    val ulm = Frame(d, Some("doc_id"))
      .trainUnigramLm("text", maxLen = 4, seedSize = 20, iters = 1)
    assert(ulm.pieces ==
      graft.operators.UnigramLm.train(d, "text", 4, 20, 1).pieces)
    val segged = Frame(d, Some("doc_id")).tokenizeUnigram("text", ulm).df
    assert(segged.columns.contains("unigram_pieces") &&
      segged.count() == d.count())
  }

  test("skewReport / profileNulls facades match the registry queries") {
    same("q_skew_report",
      Frame(Tables.orders(spark, sfDir)).skewReport("o_custkey"))
    same("q_null_profile", Frame(Tables.lineitem(spark, sfDir)
        .select(nullif(col("l_returnflag"), lit("R")).as("rf"),
          nullif(col("l_linestatus"), lit("F")).as("ls"),
          col("l_quantity").as("q")))
      .profileNulls("rf", "ls", "q")
      .sortValues("column"))
  }

  test("brute-force + compressed retrieval facades match the registry queries") {
    val emb = Frame(Tables.load(spark, sfDir, "embeddings"), Some("vec_id"))
    val qs = emb.filter(emb("vec_id") < 3)
    same("q_cosine_topk", emb.cosineTopK(qs, "embedding", k = 5)
      .transform(_.select(col("query_id"), col("vec_id"),
          round(col("c"), 9).as("cosine"))
        .orderBy("query_id", "vec_id")))
    same("q_mmr_rerank", emb.mmrRerank(
        Frame(emb.cosineTopK(qs, "embedding", k = 8).toDF
          .select(col("query_id"), col("vec_id"), col("c").as("rel"))),
        "embedding", k = 3, lambda = 0.5)
      .transform(_.select(col("query_id"), col("vec_id"),
          round(col("mmr"), 9).as("mmr"), col("rn"))
        .orderBy("query_id", "rn")))
    same("q_sq8_topk", emb.sq8TopK(qs, "embedding", dim = 64, k = 5)
      .transform(_.select(col("query_id"), col("vec_id"),
          round(col("c"), 9).as("cosine_sq8"))
        .orderBy("query_id", "vec_id")))
    same("q_rp_topk", emb.rpTopK(qs, "embedding", dim = 64, outDim = 16, k = 5)
      .transform(_.select(col("query_id"), col("vec_id"),
          round(col("c"), 9).as("cosine_rp"))
        .orderBy(col("query_id"), col("cosine_rp").desc, col("vec_id"))))
    same("q_binary_hamming", emb.hammingTopK(qs, "embedding", dim = 64, k = 5)
      .transform(_.orderBy(col("query_id"), col("hamming"), col("vec_id"))))
    same("q_pq_topk", emb.pqTopK(qs, "embedding", dim = 64, m = 4, ks = 8, k = 5)
      .transform(_.select(col("query_id"), col("vec_id"),
          round(col("c"), 6).as("cosine_pq"))
        .orderBy(col("query_id"), col("cosine_pq").desc, col("vec_id"))))
  }

  test("ANN / IVF / clustering facades match the registry queries") {
    val emb = Frame(Tables.load(spark, sfDir, "embeddings"), Some("vec_id"))
    val qs = emb.filter(emb("vec_id") < 3)
    same("q_ann_lsh", emb.annTopK(qs, "embedding", dim = 64, numPlanes = 4, k = 3)
      .transform(_.select(col("query_id"), col("vec_id"),
          round(col("c"), 9).as("cosine"))
        .orderBy("query_id", "vec_id")))
    same("q_ivf_topk", emb.ivfTopK(qs, "embedding", nlist = 8, nprobe = 2, k = 3)
      .transform(_.select(col("query_id"), col("vec_id"),
          round(col("c"), 9).as("cosine"))
        .orderBy("query_id", "vec_id")))
    same("q_ivf_pq_topk", emb.ivfPqTopK(qs, "embedding", nlist = 8, nprobe = 2,
        dim = 64, m = 4, ks = 8, k = 3)
      .transform(_.select(col("query_id"), col("vec_id"),
          round(col("c"), 6).as("cosine_ivfpq"))
        .orderBy(col("query_id"), col("cosine_ivfpq").desc, col("vec_id"))))
    same("q_embedding_near_dup", emb
      .embeddingNearDuplicates("embedding", dim = 64, numPlanes = 4,
        threshold = 0.3)
      .transform(_.select(col("vec_a"), col("vec_b"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("vec_a", "vec_b")))
    same("q_semantic_dedup", emb.semanticDedup("embedding", nlist = 8)
      .transform(_.select(col("cell"), col("rep_id"),
          round(col("rep_cos"), 9).as("rep_cos"), col("cell_size"))
        .orderBy("cell")))
    same("q_kmeans_cells", emb.kmeansCells("embedding", k = 8, iters = 3,
        roundTo = 6)
      .transform(_.groupBy("cell")
        .agg(count(lit(1)).as("cell_size"),
          round(avg("cell_cos"), 6).as("avg_cos"))
        .orderBy("cell")))
    same("q_silhouette", emb.silhouette("embedding", k = 8, iters = 3,
        roundTo = 6)
      .transform(_.groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg("silhouette"), 6).as("avg_silhouette"))
        .orderBy("cell")))
    same("q_margin_mine", Frame(emb.df.filter(
          col("vec_id") % 2 === 0 && col("vec_id") < 80), Some("vec_id"))
      .marginMine(Frame(emb.df.filter(col("vec_id") % 2 === 1),
          Some("vec_id")), "embedding", k = 4, minMargin = 1.0)
      .transform(_.select(col("src_id"), col("tgt_id"),
          round(col("c"), 9).as("c"), round(col("margin"), 9).as("margin"),
          col("rn"))
        .orderBy("src_id", "rn")))
    same("q_embedding_diversity", emb.embeddingDiversity("embedding", "label")
      .transform(_.select(col("label"), col("n_vecs"),
          round(col("mean_sq_norm"), 6).as("mean_sq_norm"),
          round(col("centroid_sq_norm"), 6).as("centroid_sq_norm"),
          round(col("mean_pairwise_sq_dist"), 6).as("mean_pairwise_sq_dist"))
        .orderBy("label")))
  }

  test("fuzzyPairs / kAnonymity facades match the registry queries") {
    val part10 = Frame(Tables.part(spark, sfDir)
      .filter(col("p_partkey") % 10 === 0), Some("p_partkey"))
    same("q_fuzzy_match", part10
      .fuzzyPairs("p_name", maxDist = 2)
      .transform(_.groupBy(col("dist").cast("int").as("dist"))
        .agg(count(lit(1)).as("n_pairs"), countDistinct("id_a").as("n_left"))
        .orderBy("dist")))
    same("q_k_anonymity", Frame(Tables.customer(spark, sfDir))
      .kAnonymity(25, "c_nationkey", "c_mktsegment")
      .sortValues("c_nationkey", "c_mktsegment"))
    same("q_l_diversity", Frame(Tables.customer(spark, sfDir)
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000)))
      .lDiversity(3, "bal_bucket", "c_nationkey", "c_mktsegment")
      .sortValues("c_nationkey", "c_mktsegment"))
  }

  test("temporalSplit facade matches the registered query") {
    same("q_temporal_split", Frame(Tables.events(spark, sfDir))
      .temporalSplit("ts", testUnits = 7, embargoUnits = 2)
      .transform(_.groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          min("ts").as("min_ts"), max("ts").as("max_ts"))
        .orderBy("split")))
  }

  test("hygieneFunnel facade matches the registered query") {
    same("q_hygiene_funnel",
      Frame(Tables.documents(spark, sfDir), index = Some("doc_id"))
        .hygieneFunnel("source", "text"))
  }

  test("winnowAgainstIndex facade matches the registered query") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val fpIndex = graft.operators.TextDedup.winnowFingerprints(
        docs.filter(col("doc_id") % 10 < 8), "doc_id", "text", 3, 4)
      .select(col("doc_id").as("idx_id"), col("fp"))
    same("q_incremental_winnow",
      Frame(docs.filter(col("doc_id") % 10 >= 8), index = Some("doc_id"))
        .winnowAgainstIndex(fpIndex, "text", k = 3, w = 4, minShared = 3L)
        .sortValues("new_id", "idx_id"))
  }

  test("purgeAgainstIndex facade matches the registered query") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val idx = graft.operators.TextDedup.windowHashIndex(
      docs.filter(col("doc_id") % 10 < 8), "text", windowWords = 4)
    same("q_purge_against_index",
      Frame(docs.filter(col("doc_id") % 10 >= 8), index = Some("doc_id"))
        .purgeAgainstIndex(idx, "text", windowWords = 4)
        .sortValues("doc_id"))
  }

  test("corrMatrix facade matches the registered query") {
    same("q_corr_matrix", fr("lineitem")
      .corrMatrix("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .sortValues("col_a", "col_b"))
  }

  test("corpusStats facade matches the registered query") {
    val want = SparkEntry.queries("q_corpus_stats")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val got = Frame(Tables.documents(spark, sfDir))
      .corpusStats("source", "text").toDF
      .select(col("source"), col("n_docs"), col("n_tokens"), col("vocab"),
        round(col("hapax_frac"), 9).as("hapax_frac"),
        col("top_word"), round(col("top_word_frac"), 9).as("top_word_frac"))
      .orderBy("source")
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("curriculumOrder facade matches the registered query") {
    same("q_curriculum_order", Frame(Tables.documents(spark, sfDir),
        Some("doc_id"))
      .curriculumOrder("n_chars", stages = 4, batchRows = 256L)
      .transform(_.groupBy("batch")
        .agg(count(lit(1)).as("n_rows"),
          min("stage").as("stage_min"), max("stage").as("stage_max"),
          min("position").as("pos_min"), max("position").as("pos_max"))
        .orderBy("batch")))
  }

  test("bandPrecision facade matches the registered query") {
    same("q_lsh_precision", Frame(Tables.documents(spark, sfDir),
        Some("doc_id"))
      .bandPrecision("text")
      .transform(_.select(col("n_candidates"), col("n_verified"),
        col("precision").as("band_precision"))))
    // the registry query measures recall on its documented bounded
    // slice (doc_id % 5 = 0) — pin the facade to the same slice
    same("q_lsh_recall", Frame(Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 5 === 0), Some("doc_id"))
      .bandRecall("text"))
  }

  test("dataCard facade matches the registered query") {
    same("q_data_card", Frame(Tables.documents(spark, sfDir))
      .dataCard("text", "lang", "en", "source")
      .sortValues("metric"))
  }

  test("oovReport facade matches the registered query") {
    same("q_oov_rate", Frame(Tables.documents(spark, sfDir), Some("doc_id"))
      .oovReport("text", "source", vocabSize = 20)
      .sortValues("source"))
  }

  test("selection/retrieval facades match the registry queries") {
    val docs = Frame(Tables.documents(spark, sfDir), Some("doc_id"))

    val queries = Frame(Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 4)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(col("text"), " "), 1, 6)).as("term")))
    same("q_bm25_topk", Frame(docs.bm25Search("text", queries, k = 5).toDF
      .select(col("query_id"), col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))))

    val jq = Frame(Tables.documents(spark, sfDir).filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text")))
    same("q_jaccard_topk", Frame(docs.jaccardSearch("text", jq, n = 3, k = 5)
      .toDF
      .select(col("query_id"), col("doc_id"),
        round(col("jaccard"), 9).as("jaccard"), col("rn"))
      .orderBy("query_id", "rn")))

    val rq = Frame(Tables.documents(spark, sfDir).filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(col("text"), " "), 1, 6)).as("term")))
    val lex3 = docs.bm25Search("text", rq, k = 5)
    val knn3 = docs.jaccardSearch("text", jq, n = 3, k = 5)
    same("q_rrf_fusion", Frame(lex3.rrfFuse(Seq(knn3), k = 5).toDF
      .select(col("query_id"), col("doc_id"),
        round(col("rrf"), 9).as("rrf"), col("rn"))
      .orderBy("query_id", "rn")))

    same("q_dsir_select", Frame(docs.dsirSelect("text", col("lang") === "en",
        k = 20).toDF
      .select(col("doc_id"), round(col("weight"), 6).as("weight"),
        round(col("sel_key"), 6).as("sel_key"))
      .orderBy(col("sel_key").desc, col("doc_id"))))

    // lang is a string label — build the 0/1 label the registry uses,
    // then check the facade train + score path end to end
    val model2 = Frame(Tables.documents(spark, sfDir)
        .withColumn("y01", when(col("lang") === "en", 1.0).otherwise(0.0)),
        Some("doc_id"))
      .trainQualityModel("text", "y01", buckets = 512, iters = 2, lr = 1.0)
    same("q_quality_classifier", Frame(docs.scoreQuality("text", model2).toDF
      .select(col("doc_id"), round(col("quality"), 6).as("quality"),
        when(col("quality") >= 0.5, lit(1)).otherwise(lit(0)).as("pred"))
      .orderBy("doc_id")))

    val withTok = Frame(Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens")),
      Some("doc_id"))
    same("q_shard_manifest",
      Frame(withTok.shardManifest("n_tokens", 8192L).toDF.orderBy("shard_id")))

    same("q_perplexity_buckets",
      Frame(docs.perplexityBuckets("text", "lang").toDF.orderBy("doc_id")))
    same("q_leakage_safe_split",
      Frame(docs.leakageSafeSplit("text").toDF.orderBy("doc_id")))
  }

  test("corpus-hygiene facades match the registry queries") {
    val docs = Frame(Tables.documents(spark, sfDir), Some("doc_id"))

    same("q_substring_dedup", Frame(docs
      .purgeDuplicateSubstrings("text", windowWords = 4).toDF.orderBy("doc_id")))
    same("q_dup_gram_fraction", Frame(docs
      .dupGramFraction("text", n = 3).toDF.orderBy("doc_id")))
    same("q_cluster_keep_best", Frame(docs
      .collapseKeepBest("text", "n_chars").toDF.orderBy("doc_id")))
    same("q_pmi_collocations", docs.pmiCollocations("text", minCount = 5, topK = 50))
    same("q_zipf_slope", docs.zipfSlope("text", topN = 100))
    same("q_rendezvous_shards", Frame(Frame(
        Tables.documents(spark, sfDir).select("doc_id"), Some("doc_id"))
      .rendezvousShard(8).toDF.orderBy("doc_id")))

    // bloom facade: index even docs' hashes, probe odds — keys found
    val keyed = Frame(Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 0).select(md5(col("text")).as("k")))
    val bloom = keyed.bloomIndex("k", bits = 1 << 15)
    val verdicts = keyed.bloomProbe(bloom, "k", bits = 1 << 15).toDF
      .collect().map(_.getBoolean(1))
    assert(verdicts.nonEmpty && verdicts.forall(identity))
  }
}
