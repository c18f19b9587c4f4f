package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity

/** Scalar-quantized retrieval: agreement with the exact baseline on
  * separated vectors, bounded quantization error, and degenerate-input
  * edges (constant dimensions, which would otherwise divide by zero).
  */
class SimilaritySpec extends SparkSpec {

  private val dim = 8

  private def corpusDf(rows: Seq[(Long, Seq[Float])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }),
      schema)
  }

  /** Deterministic pseudo-random unit-ish vectors. */
  private def vec(seed: Int): Seq[Float] =
    (0 until dim).map(d => (((seed * 31 + d) * 2654435761L % 1000) / 500.0f) - 1.0f)

  test("sq8TopK matches exact cosineTopK ranking on separated vectors") {
    val corpus = corpusDf((0L until 40L).map(i => (i, vec(i.toInt))))
    val queries = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Similarity.cosineTopK(queries, corpus, k = 3)
      .select("query_id", "vec_id", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sq8 = Similarity.sq8TopK(queries, corpus, dim, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical neighbor sets, and scores within the SQ8 error envelope:
    // per-dim reconstruction error <= (mx-mn)/510, which for these
    // vectors keeps cosine within ~1e-2 of exact
    assert(sq8.keySet === exact.keySet)
    sq8.foreach { case (k, c) => assert(math.abs(c - exact(k)) < 1e-2, s"$k: $c vs ${exact(k)}") }
  }

  test("mmrRerank matches a local greedy MMR reference") {
    val corpus = corpusDf((0L until 30L).map(i => (i, vec(i.toInt))))
    val queries = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val lam = 0.5
    val cand = Similarity.cosineTopK(queries, corpus, k = 6)
      .select(col("query_id"), col("vec_id"), col("c").as("rel"))
      .join(corpus, Seq("vec_id"))
    val got = Similarity.mmrRerank(cand, k = 3, lambda = lam)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap

    // local greedy replay over the same candidates
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (d, na, nb) = (0 until dim).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, na, nb), i) =>
          (d + a(i).toDouble * b(i).toDouble,
           na + a(i).toDouble * a(i).toDouble,
           nb + b(i).toDouble * b(i).toDouble)
      }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val vecs = (0L until 30L).map(i => i -> vec(i.toInt)).toMap
    val candLocal = cand.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("query_id"),
        r.getAs[Double]("rel")))
      .groupBy(_._2).view.mapValues(_.map(t => t._1 -> t._3).toMap).toMap
    got.foreach { case (qid, sel) =>
      var chosen = Vector.empty[(Long, Double)]
      val pool = scala.collection.mutable.Map(candLocal(qid).toSeq: _*)
      for (_ <- 1 to 3) {
        val best = pool.map { case (id, rel) =>
          val ms = if (chosen.isEmpty) 0.0
            else chosen.map(c => cos(vecs(id), vecs(c._1))).max
          (id, lam * rel - (if (chosen.isEmpty) 0.0 else (1 - lam) * ms))
        }.minBy { case (id, s) => (-s, id) }
        chosen :+= best
        pool.remove(best._1)
      }
      assert(sel.map(_._1) == chosen.map(_._1),
        s"query $qid selected ${sel.map(_._1)} vs local ${chosen.map(_._1)}")
      sel.zip(chosen).foreach { case ((_, s), (_, ls)) =>
        assert(math.abs(s - ls) < 1e-12) }
    }
  }

  test("mmrRerank diversifies: near-duplicate of pick 1 is skipped") {
    // docs 10 and 11 nearly identical (both highly relevant); doc 12
    // moderately relevant but far from 10 — at λ=0.5 the pick-2 margin
    // rel − max_sim favors 12 (0.6 − 0.59 ≈ +0.01) over the near-dup
    // 11 (0.99 − 0.9999 ≈ −0.01), so MMR must pick 10 then 12.
    def pad(xs: Double*) = xs.map(_.toFloat) ++ Seq.fill(dim - xs.size)(0.0f)
    val corpus = corpusDf(Seq(
      (10L, pad(0.99, 0.141)),
      (11L, pad(0.99, 0.1411)),
      (12L, pad(0.6, 0.0, 0.8))))
    val q = corpusDf(Seq((0L, pad(1.0))))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cand = Similarity.cosineTopK(q, corpus, k = 3)
      .select(col("query_id"), col("vec_id"), col("c").as("rel"))
      .join(corpus, Seq("vec_id"))
    val picks = Similarity.mmrRerank(cand, k = 2, lambda = 0.5)
      .collect().sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(picks == Seq(10L, 12L), s"got $picks")
  }

  test("mmrRerank k=1 is the relevance argmax; empty candidates yield no rows") {
    val corpus = corpusDf((0L until 5L).map(i => (i, vec(i.toInt))))
    val q = corpusDf(Seq((0L, vec(0))))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cand = Similarity.cosineTopK(q, corpus, k = 3)
      .select(col("query_id"), col("vec_id"), col("c").as("rel"))
      .join(corpus, Seq("vec_id"))
    val one = Similarity.mmrRerank(cand, k = 1, lambda = 0.5).collect()
    assert(one.length == 1 && one.head.getInt(3) == 1)
    val top = Similarity.cosineTopK(q, corpus, k = 1).collect().head.getLong(1)
    assert(one.head.getLong(1) == top)
    assert(Similarity.mmrRerank(cand.filter(lit(false)), k = 2).count() == 0)
  }

  test("sq8TopK survives constant dimensions without NaN") {
    // dim 0 constant across the corpus: mx == mn there
    val rows = (0L until 10L).map(i => (i, 1.0f +: vec(i.toInt).tail))
    val corpus = corpusDf(rows)
    val queries = corpus.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val out = Similarity.sq8TopK(queries, corpus, dim, k = 5).collect()
    assert(out.length === 5)
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  test("sq8TopK on an empty corpus returns no rows") {
    val corpus = corpusDf(Seq.empty)
    val queries = corpusDf(Seq((0L, vec(0)))).select(
      col("vec_id").as("query_id"), col("embedding").as("qv"))
    assert(Similarity.sq8TopK(queries, corpus, dim, k = 3).count() === 0)
  }

  test("sq8TopK scores are permutation-stable under corpus repartition") {
    val corpus = corpusDf((0L until 30L).map(i => (i, vec(i.toInt))))
    val queries = corpus.filter(col("vec_id") === 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val a = Similarity.sq8TopK(queries, corpus, dim, k = 4)
      .orderBy("vec_id").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val b = Similarity.sq8TopK(queries, corpus.repartition(7), dim, k = 4)
      .orderBy("vec_id").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(a === b)
  }

  test("native pq_reconstruct equals the interpreted HOF form bit-for-bit") {
    val corpus = Tables.embeddings(spark, sfDir)
    val codebook = Similarity.pqCodebook(corpus, ks = 8)
    val m = 4
    val subDim = codebook(0).length / m
    val native = corpus.select(col("vec_id"),
        Similarity.pqRecon(col("embedding"), codebook, m, subDim).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val hof = corpus.select(col("vec_id"),
        Similarity.pqReconHof(col("embedding"), codebook, m, subDim).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(native.keySet == hof.keySet)
    // exact double equality — same fold order, same argmin tie rule
    native.foreach { case (id, v) => assert(v == hof(id), s"vec $id differs") }
  }

  test("pq kernel matches the HOF form on adversarial NaN/Inf vectors") {
    import spark.implicits._
    // NaN distances: the HOF's array_min treats NaN as largest (skipped
    // unless ALL are NaN, when NaN==NaN ordering picks codeword 1); the
    // kernel's strict-< scan must coincide on every case.
    val weird = Seq(
      (1L, Array.fill(8)(Float.NaN)),
      (2L, Array(Float.NaN, 1f, 2f, 3f, Float.NaN, 1f, 2f, 3f)),
      (3L, Array(Float.PositiveInfinity, 1f, 2f, 3f, 4f, 5f, 6f, 7f)),
      (4L, Array(Float.NegativeInfinity, 0f, 0f, 0f, 1f, 1f, 1f, 1f)),
      (5L, Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val cb: Array[Seq[Double]] = Array(
      Seq(0.0, 1, 2, 3, 4, 5, 6, 7), Seq(7.0, 6, 5, 4, 3, 2, 1, 0))
    val m = 2
    val native = weird.select(col("vec_id"),
        Similarity.pqRecon(col("embedding"), cb, m, 4).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val hof = weird.select(col("vec_id"),
        Similarity.pqReconHof(col("embedding"), cb, m, 4).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    (1L to 5L).foreach { id =>
      assert(native(id) == hof(id), s"vec $id: ${native(id)} vs ${hof(id)}")
    }
  }

  test("topKPerQuery is bit-identical to the rank-window form, incl. ties") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // scores engineered with exact ties (0.5 at ids 3,7,11,...) so the
    // vec_id tie-break is exercised; several partitions so the partial
    // merge path runs
    val scored = (0L until 200L).flatMap { v =>
      (0L until 3L).map(q => (q, v, if (v % 4 == 3) 0.5 else (v * 37 % 101) / 101.0))
    }.toDF("query_id", "vec_id", "c").repartition(7)
    val w = Window.partitionBy("query_id").orderBy(col("c").desc, col("vec_id"))
    val viaWindow = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("query_id", "vec_id", "c", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaAgg = Similarity.topKPerQuery(scored, 10, "c", scoreDesc = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaAgg == viaWindow)
    // ascending variant (hamming-style int scores) preserves the int type
    val ints = scored.withColumn("d", (col("vec_id") % 5).cast("int"))
    val wAsc = Window.partitionBy("query_id").orderBy(col("d"), col("vec_id"))
    val ascWindow = ints.withColumn("rn", row_number().over(wAsc))
      .filter(col("rn") <= 7).select("query_id", "vec_id", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ascAgg = Similarity.topKPerQuery(ints, 7, "d", scoreDesc = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ascAgg == ascWindow)
  }

  test("recallAtK counts exact-list hits per query") {
    import spark.implicits._
    val exact = Seq((0L, 10L), (0L, 11L), (0L, 12L), (1L, 20L), (1L, 21L))
      .toDF("query_id", "vec_id")
    // query 0: approx finds 2 of 3 (+1 spurious, ignored); query 1: 0 of 2
    val approx = Seq((0L, 10L), (0L, 12L), (0L, 99L), (1L, 98L))
      .toDF("query_id", "vec_id")
    val got = Similarity.recallAtK(exact, approx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      0L -> ((3L, 2L, 2.0 / 3.0)),
      1L -> ((2L, 0L, 0.0))))
    // non-distinct candidate lists must not inflate the metric
    val got2 = Similarity.recallAtK(exact.union(exact), approx.union(approx))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got2 == got, s"duplicates changed recall: $got2")
  }

  test("recallAtK of a retrieval list against itself is 1.0") {
    val corpus = corpusDf((0L until 8L).map(i =>
      i -> Seq.tabulate(4)(j => (i * 4 + j + 1).toFloat)))
    val queries = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Similarity.cosineTopK(queries, corpus, k = 3)
      .select("query_id", "vec_id")
    val rec = Similarity.recallAtK(exact, exact).collect()
    assert(rec.length == 2 && rec.forall(r =>
      r.getLong(1) == 3L && r.getDouble(3) == 1.0),
      s"${rec.map(_.toSeq).toSeq}")
  }

  test("marginMine matches a local replay of the margin criterion") {
    val src = corpusDf((0L until 6L).map(i => (i, vec(i.toInt))))
    val tgt = corpusDf((100L until 120L).map(i => (i, vec(i.toInt * 7))))
    val k = 3; val thr = 1.0
    val got = Similarity.marginMine(src, tgt, k, thr)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getInt(4)))).toMap

    // local replay
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def d(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      d(a, b) / math.sqrt(d(a, a)) / math.sqrt(d(b, b))
    }
    val sv = (0L until 6L).map(i => i -> vec(i.toInt)).toMap
    val tv = (100L until 120L).map(i => i -> vec(i.toInt * 7)).toMap
    def topk(q: Seq[Float], corp: Map[Long, Seq[Float]]) =
      corp.toSeq.map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k)
    val fwd = sv.map { case (s, v) => s -> topk(v, tv) }
    val aSrc = fwd.map { case (s, l) => s -> l.map(_._2).sum / l.size }
    val cand = fwd.values.flatten.map(_._1).toSet
    val aTgt = cand.map { t =>
      val l = topk(tv(t), sv); t -> l.map(_._2).sum / l.size }.toMap
    val expect = fwd.flatMap { case (s, l) => l.map { case (t, c) =>
        (s, t, c, c / ((aSrc(s) + aTgt(t)) / 2)) } }
      .filter(_._4 >= thr)
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.toSeq.sortBy(r => (-r._4, r._2)).zipWithIndex.map {
          case ((s, t, c, m), i) => (s, t) -> ((c, m, i + 1)) } }
    assert(got.keySet == expect.keySet,
      s"pair sets differ: ${got.keySet} vs ${expect.keySet}")
    for ((key, (c, m, rn)) <- expect) {
      val (gc, gm, grn) = got(key)
      assert(math.abs(gc - c) < 1e-9 && math.abs(gm - m) < 1e-9 && grn == rn,
        s"$key: got ($gc,$gm,$grn) expect ($c,$m,$rn)")
    }
  }

  test("marginMine threshold filters and an empty side yields no rows") {
    val src = corpusDf(Seq((0L, vec(1))))
    val tgt = corpusDf((100L until 110L).map(i => (i, vec(i.toInt))))
    // impossible threshold → empty
    assert(Similarity.marginMine(src, tgt, 3, 99.0).count() == 0L)
    // empty tgt → empty, no error
    assert(Similarity.marginMine(src, corpusDf(Seq.empty), 3, 0.0).count() == 0L)
  }

  test("embeddingDiversity equals the brute-force all-pairs mean") {
    import spark.implicits._
    val rows = (0L until 12L).map(i => (i, (i % 3).toInt, vec(i.toInt)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.embeddingDiversity(df, "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(4)))).toMap
    // brute force per label: mean over ordered distinct pairs
    for (lbl <- 0 until 3) {
      val vs = rows.filter(_._2 == lbl).map(_._3.map(_.toDouble))
      val pairs = for ((a, i) <- vs.zipWithIndex; (b, j) <- vs.zipWithIndex
          if i != j) yield
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val expect = pairs.sum / pairs.size
      assert(got(lbl)._1 == vs.size.toLong)
      assert(math.abs(got(lbl)._2 - expect) < 1e-9,
        s"label $lbl: got ${got(lbl)._2}, expect $expect")
    }
  }

  test("embeddingDiversity edge groups: singleton is NULL, identical vectors are 0") {
    import spark.implicits._
    val df = Seq(
      (0L, "solo", Seq(1f, 2f)),
      (1L, "same", Seq(3f, 4f)),
      (2L, "same", Seq(3f, 4f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.embeddingDiversity(df, "embedding", "label")
      .collect().map(r => r.getString(0) ->
        ((r.isNullAt(4), if (r.isNullAt(4)) 0.0 else r.getDouble(4)))).toMap
    assert(got("solo")._1, "single-vector group must be NULL")
    assert(!got("same")._1 && math.abs(got("same")._2) < 1e-9)
  }
}
