package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Randomized differential test: AsOfJoin vs a brute-force reference
  * implementation of pandas merge_asof semantics, across directions,
  * exact-match modes, tolerance, grouped and ungrouped (range-bucketed)
  * paths. Seeded, so failures reproduce.
  */
class AsOfJoinPropSpec extends SparkSpec {
  import AsOfJoinPropSpec.{L, R}

  /** Brute-force single-row match with pandas tie rules. */
  private def reference(
      left: Seq[L], right: Seq[R], useBy: Boolean,
      direction: String, allowExact: Boolean,
      tolerance: Option[Double]): Map[Int, Option[Int]] = {
    def inTol(lk: Long, rk: Long): Boolean =
      tolerance.forall(t => math.abs(lk - rk) <= t)
    left.map { l =>
      val cands = right.zipWithIndex
        .filter { case (r, _) => !useBy || r.by == l.by }
      def bw = cands
        .filter { case (r, _) => r.k < l.k || (allowExact && r.k == l.k) }
        .sortBy { case (r, i) => (r.k, i) }.lastOption
        .filter { case (r, _) => inTol(l.k, r.k) }
      def fw = cands
        .filter { case (r, _) => r.k > l.k || (allowExact && r.k == l.k) }
        .sortBy { case (r, i) => (-r.k, -i) }.lastOption
        .filter { case (r, _) => inTol(l.k, r.k) }
      val m = direction match {
        case "backward" => bw
        case "forward" => fw
        case "nearest" =>
          (bw, fw) match {
            case (Some((b, bi)), Some((f, fi))) =>
              if (l.k - b.k <= f.k - l.k) Some((b, bi)) else Some((f, fi))
            case (b, f) => b.orElse(f)
          }
      }
      l.lid -> m.map(_._1.rid)
    }.toMap
  }

  test("merge_asof matches brute force across the parameter space") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 0 until 24) {
      val useBy = trial % 2 == 0
      val direction = Seq("backward", "forward", "nearest")(trial % 3)
      val allowExact = (trial / 3) % 2 == 0
      val tolerance = if ((trial / 6) % 2 == 0) None else Some(3.0)

      val left = (0 until 20).map(i =>
        L(rnd.nextInt(3), rnd.nextInt(15).toLong, i))
      val right = (0 until 15).map(i =>
        R(rnd.nextInt(3), rnd.nextInt(15).toLong, i))

      val lDf = left.map(l => (l.by, l.k, l.lid)).toDF("by", "k", "lid")
      val rDf0 = right.map(r => (r.by, r.k, r.rid)).toDF("by", "k", "rid")
      val rDf = if (useBy) rDf0 else rDf0.drop("by")
      val got = AsOfJoin.mergeAsOf(
          lDf, rDf, on = "k",
          by = if (useBy) Seq("by") else Nil,
          direction = direction, tolerance = tolerance,
          allowExactMatches = allowExact,
          numBuckets = 4) // small buckets exercise the carry path
        .select("lid", "rid").collect()
        .map(r => r.getInt(0) -> Option(r.get(1)).map(_.asInstanceOf[Int]))
        .toMap

      val want = reference(left, right, useBy, direction, allowExact, tolerance)
      val label = s"trial=$trial by=$useBy dir=$direction exact=$allowExact tol=$tolerance"
      assert(got.keySet == want.keySet, s"$label: left rows lost")
      want.foreach { case (lid, exp) =>
        assert(got(lid) == exp, s"$label lid=$lid: got ${got(lid)}, want $exp")
      }
    }
  }

  test("map_overlap centered sum matches direct computation") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new Random(7)
    val n = 200
    val data = (0 until n).map(i => (i.toLong, rnd.nextInt(100).toDouble))
    val df = data.toDF("id", "v")
    for (win <- Seq(1, 3)) {
      val out = StructType(Seq(StructField("id", LongType), StructField("s", DoubleType)))
      val got = operators.MapOverlap.mapOverlap(df, "id", win, win, out, numPartitions = 7) {
        (block, start, end) =>
          (start until end).iterator.map { i =>
            val lo = math.max(0, i - win); val hi = math.min(block.length - 1, i + win)
            Row(block(i).getLong(0), (lo to hi).map(block(_).getDouble(1)).sum)
          }
      }.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val sorted = data.sortBy(_._1)
      sorted.indices.foreach { i =>
        val lo = math.max(0, i - win); val hi = math.min(n - 1, i + win)
        val want = (lo to hi).map(sorted(_)._2).sum
        assert(got(sorted(i)._1) == want, s"win=$win id=${sorted(i)._1}")
      }
    }
  }
}

object AsOfJoinPropSpec {
  case class L(by: Int, k: Long, lid: Int)
  case class R(by: Int, k: Long, rid: Int)
}
