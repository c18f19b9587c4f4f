package graft

/** Physical-plan audits: the properties that make the query set safe at
  * 100 TB are asserted, not assumed.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("no query plan contains a cartesian product") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("projection+filter reach the parquet scan") {
    val p = plan("q_projection_filter")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("GreaterThan(l_quantity") || p.contains("IsNotNull(l_quantity"),
      "quantity filter not pushed to parquet")
    // pruned read schema: only the 4 projected + filtered columns
    assert(!p.contains("l_shipdate"), "unused column not pruned from scan")
  }

  test("star-schema dimensions broadcast") {
    val p = plan("q_join_broadcast_star")
    assert(p.contains("BroadcastHashJoin"), "dimension join did not broadcast")
  }

  test("top-k compiles to TakeOrderedAndProject") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
    assert(plan("q_tail").contains("TakeOrderedAndProject"))
  }

  test("cumprod window has no per-row array materialization") {
    val p = plan("q_cumprod")
    assert(!p.contains("collect_list"), "cumprod fell back to collect_list fold")
  }

  test("bucketed tables join without a shuffle") {
    // The co-location story at 100 TB: both sides bucketed+sorted by the
    // join key produce a SortMergeJoin with no Exchange above the scans.
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      Tables.orders(spark, sfDir).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
      Tables.customer(spark, sfDir).write
        .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), "expected a sort-merge join")
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("Explain.stages exposes the reference's staged explain") {
    val df = SparkEntry.queries("q_projection_filter")(spark, sfDir)
    val st = Explain.stages(df)
    assert(st.map(_._1) == Seq("parsed", "analyzed", "optimized", "physical"))
    assert(st.forall(_._2.nonEmpty))
    // the optimized stage must show pushdown did its work: the filter
    // survives while the physical stage shows the parquet-level pushdown
    assert(st.toMap.apply("physical").contains("PushedFilters"))
  }

  test("value_counts normalizes in-plan, not via a pre-computed scalar") {
    val analyzed = SparkEntry.queries("q_value_counts")(spark, sfDir)
      .queryExecution.analyzed.toString
    assert(analyzed.contains("windowspecdefinition"),
      "proportion is not a window sum — was the total collected eagerly?")
  }
}
