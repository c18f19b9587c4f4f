package graft

import org.apache.spark.sql.functions._

/** The bounded-buffer collect behind every over-cap-group drop rule:
  * under-cap groups collect exactly, over-cap groups are truncated at
  * maxSize everywhere (partials, shuffle, merge) so detection costs
  * O(cap) memory per group by construction.
  */
class CollectCappedSpec extends SparkSpec {
  import graft.functions.CollectCapped

  test("under-cap groups collect the exact member set") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f"))
      .toDF("k", "v")
    val got = df.groupBy("k")
      .agg(sort_array(CollectCapped(col("v"), 10)).as("vs"))
      .orderBy("k")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[String](1).toList))
    assert(got.toList == List(
      (1, List("a", "b")), (2, List("c")), (3, List("d", "e", "f"))))
  }

  test("over-cap groups truncate at exactly maxSize regardless of group size") {
    import spark.implicits._
    // 10k-member hot key spread over many partitions + a small key;
    // with maxSize = 6 the hot key's result must be length 6 (the
    // over-cap marker for cap = 5), never the full group.
    val df = spark.range(10000).select(lit("hot").as("k"), col("id").as("v"))
      .union(Seq(("cold", 1L), ("cold", 2L)).toDF("k", "v"))
      .repartition(16)
    val got = df.groupBy("k")
      .agg(CollectCapped(col("v"), 6).as("vs"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).length))
      .toMap
    assert(got("hot") == 6, s"hot key buffered ${got("hot")} elements")
    assert(got("cold") == 2)
  }

  test("partial aggregation: plan is ObjectHashAggregate, no unbounded collect") {
    import spark.implicits._
    val df = Seq((1, 1L)).toDF("k", "v")
    val qe = df.groupBy("k").agg(CollectCapped(col("v"), 4).as("vs"))
      .queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"not object-hash aggregated:\n$p")
    assert(p.contains("partial_collect_capped") ||
      (p.contains("collect_capped") && p.contains("Partial")),
      s"no map-side partial collect_capped in plan:\n$p")
  }

  test("SQL surface and null handling") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((1, java.lang.Integer.valueOf(5)), (1, null.asInstanceOf[Integer]),
      (1, java.lang.Integer.valueOf(7)))
      .toDF("k", "v").createOrReplaceTempView("cc_in")
    val got = spark.sql(
      "SELECT sort_array(collect_capped(v, 10)) AS vs FROM cc_in GROUP BY k")
      .collect().head.getSeq[Int](0).toList
    assert(got == List(5, 7), s"nulls must be skipped, got $got")
  }
}
