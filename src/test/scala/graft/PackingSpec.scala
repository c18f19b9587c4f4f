package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing: differential vs a driver-computed reference and
  * partitioning invariance (the property the two-pass offset plan must
  * guarantee at scale).
  */
class PackingSpec extends SparkSpec {

  test("bins match a driver-computed running offset exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(300) + 1L))
    val df = rows.toDF("id", "toks")
    val got = Packing.packSequences(df, "id", "toks", capacity = 512L)
      .select("id", "tok_offset", "bin")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    var cum = 0L
    rows.foreach { case (id, t) =>
      assert(got(id) == ((cum, cum / 512L)), s"id=$id")
      cum += t
    }
  }

  test("result is invariant to input partitioning") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, (i % 37) + 1L))
    def run(parts: Int) =
      Packing.packSequences(rows.toDF("id", "toks").repartition(parts),
          "id", "toks", capacity = 100L)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(run(1) == run(13))
  }

  test("documents straddling a window boundary keep the offset-cut bin") {
    import spark.implicits._
    // 60-token docs into 100-token windows: doc 2 starts at offset 60
    // (bin 0) even though it crosses into window 1 — the offset-cut
    // policy, by construction.
    val df = Seq((1L, 60L), (2L, 60L), (3L, 60L)).toDF("id", "toks")
    val bins = Packing.packSequences(df, "id", "toks", 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }
}
