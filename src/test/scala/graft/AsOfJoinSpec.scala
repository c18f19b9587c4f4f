package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.Row

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq((1L, 10.0), (2L, 20.0), (3L, 25.0), (4L, 40.0))
    .toDF("lid", "k")
  private def right = Seq((100L, 10.0), (200L, 22.0), (300L, 39.0))
    .toDF("rid", "k")

  private def matches(df: org.apache.spark.sql.DataFrame): Map[Long, Any] =
    df.collect().map(r => r.getAs[Long]("lid") -> r.get(r.fieldIndex("rid"))).toMap

  test("backward picks last right key <= left key") {
    val out = AsOfJoin.mergeAsOf(left, right, on = "k")
    assert(matches(out) === Map(1L -> 100L, 2L -> 100L, 3L -> 200L, 4L -> 300L))
  }

  test("allowExactMatches=false excludes equal keys") {
    val out = AsOfJoin.mergeAsOf(left, right, on = "k", allowExactMatches = false)
    assert(matches(out)(1L) === null) // 10.0 == 10.0 no longer matches
    assert(matches(out)(2L) === 100L)
  }

  test("forward picks first right key >= left key") {
    val out = AsOfJoin.mergeAsOf(left, right, on = "k", direction = "forward")
    assert(matches(out) === Map(1L -> 100L, 2L -> 200L, 3L -> 300L, 4L -> null))
  }

  test("nearest breaks ties backward") {
    // left 25.0: backward 22.0 (d=3), forward 39.0 (d=14) -> 200
    // left 20.0: backward 10.0 (d=10), forward 22.0 (d=2) -> 200
    val out = AsOfJoin.mergeAsOf(left, right, on = "k", direction = "nearest")
    assert(matches(out) === Map(1L -> 100L, 2L -> 200L, 3L -> 200L, 4L -> 300L))
  }

  test("tolerance nulls far matches but keeps rows") {
    val out = AsOfJoin.mergeAsOf(left, right, on = "k", tolerance = Some(2.0))
    assert(out.count() === 4)
    assert(matches(out) === Map(1L -> 100L, 2L -> null, 3L -> null, 4L -> 300L))
  }

  test("by-groups never match across groups") {
    val l = Seq(("a", 5.0, 1L), ("b", 5.0, 2L)).toDF("g", "k", "lid")
    val r = Seq(("a", 4.0, 10L)).toDF("g", "k", "rid")
    val out = AsOfJoin.mergeAsOf(l, r, on = "k", by = Seq("g"))
    assert(matches(out) === Map(1L -> 10L, 2L -> null))
  }

  test("empty right side keeps all left rows unmatched") {
    val out = AsOfJoin.mergeAsOf(left, right.filter($"k" < 0), on = "k")
    assert(out.count() === 4)
    assert(out.filter($"rid".isNotNull).count() === 0)
  }

  test("suffix applies to clashing right column names") {
    val r = right.withColumnRenamed("rid", "lid")
    val out = AsOfJoin.mergeAsOf(left, r, on = "k")
    assert(out.columns.toSeq === Seq("lid", "k", "lid_right"))
  }
}
