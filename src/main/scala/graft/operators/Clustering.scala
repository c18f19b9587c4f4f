package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Embedding clustering: IVF (inverted-file) similarity search, semantic
  * dedup, and distributed Lloyd's k-means.
  *
  * IVF is the scale path for nearest-neighbor search that LSH bucketing
  * (see [[Similarity]]) does not cover well when the corpus is clustered
  * rather than uniform: partition the corpus into `nlist` cells keyed by
  * the nearest centroid, then probe only the `nprobe` cells nearest each
  * query. The cell id is the shuffle/partition key at 100 TB — queries
  * never touch the other `nlist - nprobe` cells, so the scan cost drops
  * by ~nlist/nprobe versus brute force.
  *
  * Centroids are deliberately DRIVER-SIDE literals: a centroid table is
  * O(nlist × dim) — a few MB even at nlist=65536 — and inlining it lets
  * cell assignment run as a pure projection inside whole-stage codegen:
  * no crossJoin row explosion, no shuffle, no broadcast round-trip.
  * The cosine folds left-to-right in double (same as [[Similarity.dot]]),
  * so an external engine replaying the fold reproduces every decision
  * bit-for-bit.
  */
object Clustering {

  /** Cosine of `vec` against one literal centroid, folded in element
    * order in double — bit-compatible with [[Similarity.dot]] /
    * the DuckDB `list_reduce` mirror.
    */
  private def cosineToLit(vec: Column, centroid: Seq[Double], norm: Double): Column = {
    val w = typedLit(centroid)
    Similarity.dot(w, vec) / (lit(norm) * Similarity.norm(vec))
  }

  /** Collect the `nlist` seed centroids: the vectors whose id is lowest
    * (deterministic, reproducible anywhere). O(nlist × dim) driver
    * traffic — bounded and documented, same class as AsOfJoin's global
    * min/max. Returns (id, vector-as-double, norm) sorted by id.
    */
  def seedCentroids(
      corpus: DataFrame, idCol: String, vecCol: String, nlist: Int): Seq[(Long, Seq[Double], Double)] = {
    val rows = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy("id").limit(nlist)
      .collect()
    rows.map { r =>
      val v = r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
      }
      // norm via the same left-to-right double fold
      val n = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
      (r.getLong(0), v, n)
    }.toIndexedSeq.sortBy(_._1)
  }

  /** Array of cosines of `vec` against every centroid, in centroid order. */
  private def cosArray(vec: Column, cents: Seq[(Long, Seq[Double], Double)]): Column =
    array(cents.map { case (_, cv, nrm) => cosineToLit(vec, cv, nrm) }: _*)

  /** Nearest-centroid cell id as a single codegen'd projection:
    * argmax of the cosine array, first-max-wins (ties → lowest cell id,
    * matching `ORDER BY c DESC, cell` in a replaying engine).
    */
  def cellOf(vec: Column, cents: Seq[(Long, Seq[Double], Double)]): Column = {
    val arr = cosArray(vec, cents)
    val ids = typedLit(cents.map(_._1))
    element_at(ids, array_position(arr, array_max(arr)).cast("int"))
  }

  /** Simplified (centroid-based) silhouette per vector — the standard
    * clustering-quality readout (Rousseeuw 1987, centroid form): with
    * cosine distance d(x, c) = 1 − cos(x, c), a = distance to the OWN
    * (nearest) centroid, b = distance to the runner-up centroid,
    * s = (b − a) / max(a, b). Because assignment is argmax-cos,
    * a ≤ b always, so s = (cos₁ − cos₂) / (1 − cos₂) ∈ [0, 1]; s near 0
    * marks a point sitting on a cell boundary (candidate for k or seed
    * tuning before a 100 TB semantic-dedup run commits to a layout).
    *
    * Pure map-only projection against the literal centroid table — the
    * assignCells/probeCells pattern: no shuffle, no join, no state.
    * Ties rank (cos desc, cell asc), matching assignCells'
    * first-max-wins and a replaying engine's `ORDER BY cc DESC, cell`.
    * The 1 − cos₂ = 0 edge (a point exactly on two centroids) yields
    * NULL via nullif, never a division error.
    *
    * Output: (idCol, cell, cell_cos, next_cos, silhouette). */
  def silhouette(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double], Double)]): DataFrame = {
    // a runner-up centroid must exist; with one cell, element_at(_, 2)
    // would throw INVALID_ARRAY_INDEX at runtime under ANSI
    require(cents.length >= 2,
      s"silhouette needs >= 2 centroids (got ${cents.length}); " +
        "it is undefined for a single cluster")
    val ranked = array_sort(zip_with(cosArray(col(vecCol), cents),
      typedLit(cents.map(_._1)),
      (c, id) => struct((-c).as("negc"), id.as("cell"))))
    corpus
      .withColumn("__p", ranked)
      .select(col(idCol),
        element_at(col("__p"), 1).getField("cell").as("cell"),
        (-element_at(col("__p"), 1).getField("negc")).as("cell_cos"),
        (-element_at(col("__p"), 2).getField("negc")).as("next_cos"))
      .withColumn("silhouette",
        (col("cell_cos") - col("next_cos")) /
          nullif(lit(1.0) - col("next_cos"), lit(0.0)))
  }

  /** Assign every corpus vector to its nearest seed-centroid cell.
    * Pure projection — no shuffle, no join. Adds `cell` (centroid id)
    * and `cell_cos` (cosine to that centroid).
    */
  def assignCells(
      corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double], Double)]): DataFrame = {
    val arr = cosArray(col(vecCol), cents)
    corpus
      .withColumn("__cos", arr)
      .withColumn("cell",
        element_at(typedLit(cents.map(_._1)),
          array_position(col("__cos"), array_max(col("__cos"))).cast("int")))
      .withColumn("cell_cos", array_max(col("__cos")))
      .drop("__cos")
  }

  /** Each query exploded to its `nprobe` best cells, ranked by
    * (cosine desc, cell asc): (query_id, qv, cell) — the probe list of
    * the IVF family, shared by [[ivfTopK]], [[ivfPqTopK]] and the
    * streaming [[graft.streaming.StreamOps.streamingVectorSearch]].
    * A pure projection: no shuffle, no state. */
  def probeCells(queries: DataFrame,
      cents: Seq[(Long, Seq[Double], Double)], nprobe: Int): DataFrame =
    queries
      .withColumn("__cos", cosArray(col("qv"), cents))
      .withColumn("__probe", explode(slice(array_sort(
        zip_with(col("__cos"), typedLit(cents.map(_._1)),
          (c, id) => struct((-c).as("negc"), id.as("cell")))), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("__probe.cell").as("cell"))

  /** IVF approximate top-k: corpus vectors live in their nearest-centroid
    * cell; each query probes only its `nprobe` nearest cells and scores
    * exact cosine inside them. The probe list is broadcast (queries are
    * small); the corpus side is one projection + one equi-join on `cell`.
    */
  def ivfTopK(
      queries: DataFrame,   // (query_id, qv)
      corpus: DataFrame,    // (vec_id, embedding, ...)
      idCol: String, vecCol: String,
      nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val cents = seedCentroids(corpus, idCol, vecCol, nlist)
    val assigned = assignCells(corpus, idCol, vecCol, cents)
    val scored = assigned.join(broadcast(probeCells(queries, cents, nprobe)),
        Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("c", Similarity.cosine(col("qv"), col(vecCol)))
    // candidates are already cell-bounded; the bounded partial top-k
    // still beats a per-query rank window when probed cells are large
    Similarity.topKPerQuery(scored, k, "c", scoreDesc = true, idCol = idCol)
  }

  /** IVF-PQ approximate top-k — the standard large-scale ANN layout
    * (coarse inverted file × product-quantized residual scoring, the
    * FAISS IVFPQ architecture from Jégou et al. 2011): corpus vectors
    * live in their nearest-centroid cell AND are stored PQ-compressed;
    * a query probes only its `nprobe` cells and scores the compressed
    * reconstruction. At 100 TB this is the shape that works: the probe
    * join touches nprobe/nlist of the corpus, each candidate costs an
    * O(dim) fold over the m-byte code's reconstruction, and both the
    * centroid table and codebook are bounded plan-time literals.
    *
    * Cell assignment and reconstruction run in ONE projection per
    * corpus row (no shuffle until the probe equi-join on `cell`).
    */
  def ivfPqTopK(
      queries: DataFrame,   // (query_id, qv)
      corpus: DataFrame,    // (vec_id, embedding, ...)
      idCol: String, vecCol: String,
      nlist: Int, nprobe: Int,
      dim: Int, m: Int, ks: Int, k: Int,
      trainedCodebook: Option[Array[Seq[Double]]] = None): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val cents = seedCentroids(corpus, idCol, vecCol, nlist)
    val codebook = trainedCodebook.getOrElse(Similarity.pqCodebook(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")), ks))
    val encoded = assignCells(corpus, idCol, vecCol, cents)
      .select(col(idCol), col("cell"),
        Similarity.pqRecon(col(vecCol), codebook, m, dim / m).as("recon"))
      .withColumn("nrm", Similarity.norm(col("recon")))
    val scored = encoded.join(broadcast(probeCells(queries, cents, nprobe)),
        Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("c",
        Similarity.dot(col("recon"), col("qv")) / col("nrm") /
          Similarity.norm(col("qv")))
    Similarity.topKPerQuery(scored, k, "c", scoreDesc = true, idCol = idCol)
      .select(col("query_id"), col(idCol), col("c"))
  }

  /** K-means-TRAINED PQ codebook — the quality path for
    * [[Similarity.pqTopK]] / [[ivfPqTopK]] at scale (FAISS-style: train
    * per-subspace centroids, not sampled corpus rows; the sampled
    * [[Similarity.pqCodebook]] stays the default oracle form).
    *
    * Lloyd's per subspace over a bounded deterministic content-hash
    * training sample (`trainRows`; FAISS trains on a sample too), with
    * ALL m subspaces trained in ONE job per iteration: every subspace's
    * cell assignment is a literal projection on the same row, the
    * (subspace, cell, dim) means ride one explode + one partial-agg
    * groupBy, and the collected update is m·ks·subDim rows — identical
    * per-subspace semantics to m independent [[kmeans]] runs (same
    * seeds, same cosine argmax, same round(avg) update, empty cells
    * keep their centroid; `roundTo ≥ 0` makes every decision
    * externally replayable) at 1/m the corpus passes.
    *
    * The per-subspace centroid lists are CONCATENATED into full-dim
    * codewords: [[graft.functions.PqReconstruct]] argmins each subspace
    * independently, so concatenation gives exact per-subspace PQ
    * semantics with the existing kernel. Returns ks codewords of dim
    * doubles.
    */
  def pqCodebookKmeans(corpus: DataFrame, ks: Int, m: Int, dim: Int,
      iters: Int = 5, trainRows: Int = 4096, roundTo: Int = 9): Array[Seq[Double]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val sample = corpus
      .select(col("vec_id"), col("embedding"),
        conv(substring(md5(col("vec_id").cast("string")), 1, 7), 16, 10)
          .cast("long").as("__r"))
      .orderBy(col("__r"), col("vec_id"))
      .limit(trainRows)
      .select("vec_id", "embedding")
      .cache()
    try {
      // seeds: the ks lowest-id sample rows, sliced per subspace — the
      // same rows for every subspace, so ONE bounded collect
      val seedRows = sample
        .select(col("vec_id").cast("long").as("id"), col("embedding"))
        .orderBy("id").limit(ks).collect()
      require(seedRows.length == ks,
        s"training sample has fewer than ks=$ks rows (${seedRows.length})")
      def toD(xs: Seq[Any]): Seq[Double] = xs.map {
        case f: Float => f.toDouble
        case d: Double => d
      }
      var cents: IndexedSeq[IndexedSeq[(Long, Seq[Double], Double)]] =
        (0 until m).map { j =>
          seedRows.map { r =>
            val v = toD(r.getSeq[Any](1)).slice(j * subDim, (j + 1) * subDim)
            (r.getLong(0), v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)))
          }.sortBy(_._1).toIndexedSeq
        }
      val meanCol =
        if (roundTo >= 0) round(avg(col("x").cast("double")), roundTo)
        else avg(col("x").cast("double"))
      for (_ <- 0 until iters) {
        val cellCols = (0 until m).map(j =>
          cellOf(slice(col("embedding"), j * subDim + 1, subDim), cents(j))
            .as(s"__c$j"))
        val updated = sample
          .select(cellCols :+ col("embedding"): _*)
          .select(array((0 until m).map(j => col(s"__c$j")): _*).as("__cells"),
            posexplode(col("embedding")).as(Seq("fd", "x")))
          .select((col("fd") / subDim).cast("int").as("j"),
            element_at(col("__cells"),
              (col("fd") / subDim).cast("int") + 1).as("cell"),
            (col("fd") % subDim).cast("int").as("d"), col("x"))
          .groupBy("j", "cell", "d")
          .agg(meanCol.as("mn"))
          .collect()
        val byJ = updated.groupBy(_.getInt(0))
        cents = (0 until m).map { j =>
          val cellMap = byJ.getOrElse(j, Array.empty[Row])
            .groupBy(_.getLong(1)).map { case (cell, rs) =>
              val v: Seq[Double] = rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
              cell -> ((v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))))
            }
          require(cellMap.values.forall(_._1.length == subDim))
          cents(j).map { case old @ (id, _, _) =>
            cellMap.get(id).map { case (v, n) => (id, v, n) }.getOrElse(old)
          }
        }
      }
      (0 until ks).map(c => (0 until m).map(j => cents(j)(c)._2)
        .reduce(_ ++ _)).toArray
    } finally sample.unpersist()
  }

  /** Semantic dedup: one representative per IVF cell — the vector most
    * central to its cell (max cosine to the centroid, ties → lowest id).
    * The coarse counterpart to MinHash near-dup: collapses *semantically*
    * redundant regions of embedding space to one exemplar each. One
    * projection + one partial-aggregating groupBy on `cell`.
    */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame = {
    val cents = seedCentroids(corpus, idCol, vecCol, nlist)
    assignCells(corpus, idCol, vecCol, cents)
      .groupBy("cell")
      .agg(
        min_by(col(idCol), struct((-col("cell_cos")).as("negc"), col(idCol))).as("rep_id"),
        max(col("cell_cos")).as("rep_cos"),
        count(lit(1)).as("cell_size"))
  }

  /** Distributed Lloyd's k-means over an embedding column.
    *
    * Each iteration is two bounded jobs: (1) cell assignment is a literal
    * projection (no shuffle); (2) the centroid update is
    * posexplode → groupBy (cell, dim) → avg — scalar shuffles, never
    * array-valued aggregation buffers — then an O(k × dim) collect.
    * Driver traffic per iteration is exactly the new centroid matrix;
    * executor memory is bounded by the partition size. Empty cells keep
    * their previous centroid.
    *
    * Returns (assignments DataFrame with `cell`, final centroids).
    *
    * `roundTo >= 0` rounds each centroid mean to that many decimals
    * after every update. The raw averages are distributed float sums
    * whose summation order differs across engines (and across runs),
    * so unrounded centroids make boundary assignments
    * non-reproducible; rounding absorbs the ~1e-12 relative drift and
    * turns the whole iteration into a deterministic function of the
    * input — an external engine replaying seed → assign → round(avg)
    * reproduces every centroid (and so every cell decision)
    * bit-for-bit. Default -1 keeps full precision for callers that
    * only need convergence, not cross-engine replay.
    */
  def kmeans(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, roundTo: Int = -1): (DataFrame, Seq[(Long, Seq[Double], Double)]) = {
    var cents = seedCentroids(corpus, idCol, vecCol, k)
    val dim = cents.head._2.length
    for (_ <- 0 until iters) {
      val assigned = assignCells(corpus, idCol, vecCol, cents)
      val meanCol =
        if (roundTo >= 0) round(avg(col("x").cast("double")), roundTo)
        else avg(col("x").cast("double"))
      val updated = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(meanCol.as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          val v: Seq[Double] = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          val n = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
          cell -> ((v, n))
        }
      require(updated.values.forall(_._1.length == dim))
      cents = cents.map { case old @ (id, _, _) =>
        updated.get(id).map { case (v, n) => (id, v, n) }.getOrElse(old)
      }
    }
    (assignCells(corpus, idCol, vecCol, cents), cents)
  }
}
