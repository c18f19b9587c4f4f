package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Similarity}

/** IVF search / semantic dedup / distributed k-means. */
class ClusteringSpec extends SparkSpec {

  /** Three well-separated synthetic clusters in 4-d: axis-aligned cones
    * with small deterministic jitter. Ids are arranged so the seed
    * vectors (lowest ids) land one per cluster.
    */
  private def clusteredVecs(perCluster: Int) = {
    import spark.implicits._
    val base = Seq(
      Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f), Seq(0f, 0f, 10f, 0f))
    (0 until 3 * perCluster).map { i =>
      val c = i % 3 // interleaved: ids 0,1,2 are one seed per cluster
      val jit = (i / 3).toFloat / 100f
      val v = base(c).zipWithIndex.map { case (x, d) => x + jit * (d + 1) }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("assignCells groups each cone with its seed, no shuffle in the plan") {
    val df = clusteredVecs(20)
    val cents = Clustering.seedCentroids(df, "vec_id", "embedding", 3)
    assert(cents.map(_._1) == Seq(0L, 1L, 2L))
    val assigned = Clustering.assignCells(df, "vec_id", "embedding", cents)
    val got = assigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 60).forall(i => got(i.toLong) == (i % 3).toLong))
    // cell assignment must be a pure projection: no exchange below it
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("ivfTopK matches brute-force top-k when the probe covers the right cell") {
    val df = clusteredVecs(20)
    val queries = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val ivf = Clustering.ivfTopK(queries, df, "vec_id", "embedding",
        nlist = 3, nprobe = 1, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.cosineTopK(queries, df, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // clusters are separated enough that each query's true top-5 all live
    // in its own cell, so nprobe=1 IVF recall is exact here
    assert(ivf == brute)
  }

  test("semanticDedup keeps exactly one representative per cell") {
    val df = clusteredVecs(10)
    val reps = Clustering.semanticDedup(df, "vec_id", "embedding", nlist = 3)
      .collect()
    assert(reps.length == 3)
    assert(reps.map(_.getAs[Long]("cell_size")).sum == 30L)
    // the representative of each cone is its seed (jitter only moves
    // vectors away from the axis, the seed is the most central)
    assert(reps.map(r => r.getAs[Long]("cell") -> r.getAs[Long]("rep_id"))
      .toMap == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("kmeans converges on separable clusters and is partitioning-invariant") {
    val df = clusteredVecs(20)
    val (a1, cents1) = Clustering.kmeans(df, "vec_id", "embedding", k = 3, iters = 3)
    val m1 = a1.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // perfect clustering: each interleaved cone keeps its own cell
    assert((0 until 60).forall(i => m1(i.toLong) == (i % 3).toLong))
    // centroid of cell 0 ≈ mean of cone 0 (10 + jitter*(d+1) pattern)
    val c0 = cents1.find(_._1 == 0L).get._2
    assert(math.abs(c0.head - (10.0 + 0.095)) < 1e-5)

    // same result under a different physical partitioning
    val (a2, _) = Clustering.kmeans(df.repartition(7), "vec_id", "embedding", k = 3, iters = 3)
    val m2 = a2.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == m2)
  }

  test("kmeans on a tiny input (k close to n) keeps k well-formed centroids") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(10f, 0f)), (1L, Seq(9f, 1f)), (2L, Seq(9.5f, 0.5f)),
      (3L, Seq(9.8f, 0.1f))).toDF("vec_id", "embedding")
    val (assigned, cents) = Clustering.kmeans(df, "vec_id", "embedding", k = 2, iters = 2)
    assert(cents.length == 2 && cents.forall(_._2.length == 2))
    assert(assigned.count() == 4)
  }

  test("silhouette matches hand arithmetic, agrees with assignCells, no shuffle") {
    import spark.implicits._
    // two orthogonal unit centroids; points at known angles
    val cents = Seq(
      (0L, Seq(1.0, 0.0), 1.0),
      (1L, Seq(0.0, 1.0), 1.0))
    val df = Seq(
      (10L, Seq(1f, 0f)),          // on centroid 0: cc1=1, cc2=0, s=1
      (11L, Seq(1f, 1f)),          // boundary: cc1=cc2=cos45 → s=0, tie→cell 0
      (12L, Seq(0.1f, 1f))         // near centroid 1
    ).toDF("vec_id", "embedding")
    val got = Clustering.silhouette(df, "vec_id", "embedding", cents)
    val rows = got.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows(10L)._1 == 0L && math.abs(rows(10L)._4 - 1.0) < 1e-12)
    // boundary point: own/runner-up cosines equal, tie ranks cell 0 first
    assert(rows(11L)._1 == 0L && math.abs(rows(11L)._4) < 1e-12)
    // hand arithmetic for 12: cos to c1 = 1/sqrt(1.01), cos to c0 = 0.1/sqrt(1.01)
    val cc1 = 1.0 / math.sqrt(1.01); val cc2 = 0.1 / math.sqrt(1.01)
    assert(rows(12L)._1 == 1L)
    assert(math.abs(rows(12L)._4 - (cc1 - cc2) / (1 - cc2)) < 1e-9)
    // cell agrees with assignCells on the same centroids
    val asg = Clustering.assignCells(df, "vec_id", "embedding", cents)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map { case (id, t) => id -> t._1 } == asg)
    // pure projection: no exchange anywhere
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("silhouette separated cones score near 1; boundary-heavy k scores lower") {
    val df = clusteredVecs(20)
    val cents = Clustering.seedCentroids(df, "vec_id", "embedding", 3)
    val s = Clustering.silhouette(df, "vec_id", "embedding", cents)
      .agg(avg("silhouette")).collect()(0).getDouble(0)
    assert(s > 0.8, s"separated cones should score high, got $s")
    // undefined for a single cluster: clear require, not an ANSI
    // array-index error at runtime
    intercept[IllegalArgumentException] {
      Clustering.silhouette(df, "vec_id", "embedding", cents.take(1))
    }
  }
}
