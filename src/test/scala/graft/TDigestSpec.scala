package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TDigestBuffer, TDigestQuantile}

/** t-digest mergeable quantile sketch: rank-error bounds against exact
  * quantiles on uniform and heavily skewed data, partition invariance,
  * serialization roundtrip, and the SQL/groupBy surfaces.
  */
class TDigestSpec extends SparkSpec {

  private val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** |rank(estimate)/n − q| — the error measure the sketch bounds. */
  private def rankError(sorted: Array[Double], est: Double, q: Double): Double = {
    val below = sorted.count(_ <= est).toDouble
    math.abs(below / sorted.length - q)
  }

  test("rank error under 1% on uniform and skewed data, any partitioning") {
    val n = 100000
    val rnd = new scala.util.Random(7)
    val uniform = Array.fill(n)(rnd.nextDouble())
    val skewed = Array.fill(n) { val x = rnd.nextDouble(); x * x * x * 1e6 } // cube-skew
    for ((data, label) <- Seq((uniform, "uniform"), (skewed, "skewed"));
         parts <- Seq(1, 16)) {
      import spark.implicits._
      val df = spark.sparkContext.parallelize(data.toSeq, parts).toDF("v")
      val sorted = data.sorted
      val cols = qs.map(q => TDigestQuantile(col("v"), q).as(s"q$q"))
      val ests = df.agg(cols.head, cols.tail: _*).head()
      qs.zipWithIndex.foreach { case (q, i) =>
        val err = rankError(sorted, ests.getDouble(i), q)
        assert(err < 0.01, s"$label/$parts-part q=$q rank error $err")
      }
    }
  }

  test("tail quantiles are sharper than mid quantiles (k1 scale function)") {
    val n = 200000
    val rnd = new scala.util.Random(11)
    val data = Array.fill(n)(rnd.nextDouble())
    import spark.implicits._
    val df = spark.sparkContext.parallelize(data.toSeq, 8).toDF("v")
    val sorted = data.sorted
    val tails = Seq(0.001, 0.999)
    val cols = tails.map(q => TDigestQuantile(col("v"), q).as(s"q$q"))
    val ests = df.agg(cols.head, cols.tail: _*).head()
    tails.zipWithIndex.foreach { case (q, i) =>
      val err = rankError(sorted, ests.getDouble(i), q)
      assert(err < 0.001, s"tail q=$q rank error $err")
    }
  }

  test("serialization roundtrips the centroid set exactly") {
    val buf = new TDigestBuffer(100.0)
    (1 to 10000).foreach(i => buf.add(math.log(i.toDouble)))
    val back = TDigestBuffer.deserialize(buf.serialized)
    assert(back.compression == 100.0)
    assert(back.means.sameElements(buf.means))
    assert(back.weights.sameElements(buf.weights))
    assert(back.quantile(0.5) == buf.quantile(0.5))
  }

  test("merge of disjoint buffers equals single-buffer digest within tolerance") {
    val all = new TDigestBuffer(100.0)
    val lo = new TDigestBuffer(100.0)
    val hi = new TDigestBuffer(100.0)
    val rnd = new scala.util.Random(3)
    val data = Array.fill(50000)(rnd.nextGaussian())
    data.foreach { x =>
      all.add(x); (if (x < 0) lo else hi).add(x)
    }
    lo.addAll(hi)
    val sorted = data.sorted
    qs.foreach { q =>
      val merged = lo.quantile(q).get
      assert(rankError(sorted, merged, q) < 0.01, s"merged q=$q")
      assert(math.abs(merged - all.quantile(q).get) <
        3 * (sorted.last - sorted.head) / 100, s"merged vs single q=$q")
    }
  }

  test("SQL surface and per-group digests; empty and single-value groups") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 42.0))
      .toDF("g", "v")
    val byGroup = df.groupBy("g")
      .agg(expr("tdigest_quantile(v, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byGroup("a") == 2.0 && byGroup("b") == 42.0)
    // all-null input → null estimate
    val nullRow = Seq[Option[Double]](None, None).toDF("v")
      .agg(expr("tdigest_quantile(v, 0.5)")).head()
    assert(nullRow.isNullAt(0))
    // integer column casts through the numeric widening in update()
    val intMed = spark.range(1, 1002)
      .agg(expr("tdigest_quantile(id, 0.5, 200.0)").as("m")).head().getDouble(0)
    assert(math.abs(intMed - 501.0) < 5.0)
  }
}
