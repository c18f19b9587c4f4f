package graft

import org.apache.spark.sql.functions._

/** graft_feature_dot: the codegen'd sparse·dense inner product behind
  * every LR score — pinned BIT-EXACT to the interpreted fold it
  * replaced (same elements, same left-to-right order).
  */
class FeatureDotSpec extends SparkSpec {
  import graft.functions.FeatureDot

  private def fxDf = {
    import spark.implicits._
    Seq(
      (1L, Seq((0L, 0.25), (3L, 0.5), (7L, -1.5))),
      (2L, Seq((7L, 0.125))),
      (3L, Seq.empty[(Long, Double)]),
      // out-of-range bucket: kernel skips it, fold form never sees one
      (4L, Seq((99L, 5.0), (1L, 2.0))))
      .toDF("doc_id", "raw")
      .select(col("doc_id"),
        transform(col("raw"), e =>
          struct(e.getField("_1").as("b"), e.getField("_2").as("x")))
          .as("fx"))
  }

  test("bit-equal to the interpreted aggregate fold") {
    val ws = (0 until 8).map(b => math.sin(b + 1)) // arbitrary weights
    val warr = typedLit(ws)
    val got = fxDf
      .filter(!exists(col("fx"), e => e.getField("b") >= 8)) // fold can't take OOR
      .select(col("doc_id"),
        FeatureDot(col("fx"), ws).as("k"),
        aggregate(col("fx"), lit(0.0), (acc, e) =>
          acc + e.getField("x") *
            element_at(warr, (e.getField("b") + 1).cast("int"))).as("f"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"doc ${r.getLong(0)}: kernel ${r.getDouble(1)} != fold ${r.getDouble(2)}")
    }
  }

  test("null array -> null; empty array -> 0.0; out-of-range buckets skipped") {
    import spark.implicits._
    val ws = Seq(1.0, 2.0)
    val withNull = Seq((1L, false), (2L, true)).toDF("doc_id", "isNull")
      .select(col("doc_id"),
        when(col("isNull"), lit(null))
          .otherwise(array(struct(lit(1L).as("b"), lit(3.0).as("x"))))
          .as("fx"))
    val r = withNull.select(FeatureDot(col("fx"), ws)).collect()
    assert(r(0).getDouble(0) == 6.0)
    assert(r(1).isNullAt(0))
    val oor = fxDf.filter(col("doc_id") === 4L)
      .select(FeatureDot(col("fx"), ws)).head().getDouble(0)
    assert(oor == 4.0, s"out-of-range bucket not skipped: $oor")
    val empty = fxDf.filter(col("doc_id") === 3L)
      .select(FeatureDot(col("fx"), ws)).head().getDouble(0)
    assert(empty == 0.0)
  }

  test("stays inside whole-stage codegen") {
    // spark.range keeps a real plan (a local Seq constant-folds to a
    // LocalTableScan and proves nothing)
    val ws = Seq(1.0, 2.0)
    val df = spark.range(100).select(col("id"),
      array(struct((col("id") % 2).as("b"), lit(0.5).as("x"))).as("fx"))
    val q = df.select(FeatureDot(col("fx"), ws).as("s")).filter(col("s") > 0)
    val p = q.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    assert(p.contains("*(1) Project [graft_feature_dot"),
      s"kernel fell out of codegen:\n$p")
    assert(q.count() == 100)
  }
}
