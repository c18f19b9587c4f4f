package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document dedup operators for large-scale text pipelines: exact
  * content-hash dedup, MinHash signatures, banded LSH candidate
  * generation, and exact-Jaccard verification.
  *
  * Everything is declarative DataFrame code so Catalyst plans the
  * shuffles; nothing materializes on the driver. Crucially there is NO
  * all-pairs comparison anywhere: candidate pairs come from equality
  * joins on (band, signature) buckets, so the join fan-out at 100 TB is
  * proportional to the number of true near-duplicates, not n².
  *
  * Hashes are md5-based (not Spark's murmur3) so an external engine can
  * reproduce the exact signatures for verification; md5 hex strings
  * compare lexicographically the same everywhere.
  */
object TextDedup {

  /** Exact dedup, keep-first: one row per distinct content hash with the
    * smallest id. Equivalent shape to dropDuplicates(subset) but with an
    * explicit deterministic keep policy (dropDuplicates keeps an
    * arbitrary row).
    */
  def exactDedupKeepFirst(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("h")).orderBy(col(idCol))
    docs.withColumn("h", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Word n-gram shingles: (id, sh); `distinct = false` keeps the raw
    * stream (no shuffle) for consumers where duplicates are harmless. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int,
      distinct: Boolean = true): DataFrame = {
    // A corpus read from few splits (one small file locally) would run
    // the explode + hashing chain near-serially; spread it first. With
    // a well-split source (the 100 TB case) this is a no-op.
    val spark = docs.sparkSession
    val src =
      if (docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        docs.repartition(spark.sparkContext.defaultParallelism)
      else docs
    val ws = split(col(textCol), " ")
    val raw = src.select(col(idCol),
      explode(when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
        .otherwise(array())).as("sh"))
    if (distinct) raw.distinct() else raw
  }

  /** MinHash signature rows: (id, i, mh) for i in [0, k).
    * mh_i = min over shingles of md5(i || '|' || shingle). Long format
    * for per-hash inspection; the LSH pipeline uses the wide
    * `bandSignatures` path below, which never explodes per-hash rows.
    */
  def minHash(sh: DataFrame, idCol: String, k: Int): DataFrame =
    sh.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(k - 1)),
          i => md5(concat(i.cast("string"), lit("|"), col("sh"))))).as(Seq("i", "h")))
      .groupBy(col(idCol), col("i"))
      .agg(min("h").as("mh"))

  /** Banded signatures: (id, band, sig) with r minhashes concatenated per
    * band in hash-index order, straight from the shingle stream.
    *
    * One groupBy(id) with k `min` aggregates: partial aggregation
    * combines map-side, so the only shuffle carries one k-string row per
    * (id, input partition) — not k× the shingle count. Duplicate
    * shingles don't change a min, so the input needs no distinct pass.
    */
  def bandSignatures(sh: DataFrame, idCol: String, k: Int, r: Int): DataFrame = {
    val mins = (0 until k).map(i =>
      min(md5(concat(lit(s"$i|"), col("sh")))).as(s"__mh$i"))
    val wide = sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until k / r).map(b =>
      struct(lit(b).as("band"),
        concat_ws(",", (b * r until (b + 1) * r).map(i => col(s"__mh$i")): _*).as("sig")))
    wide.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Candidate pairs from LSH buckets: ids sharing any (band, sig). */
  def candidatePairs(sig: DataFrame, idCol: String): DataFrame = {
    val a = sig.select(col(idCol).as("doc_a"), col("band"), col("sig"))
    val b = sig.select(col(idCol).as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Full near-duplicate pipeline: shingle → MinHash(k) → LSH(r-row
    * bands) → candidate pairs → exact-Jaccard verify ≥ threshold.
    * Returns (doc_a, doc_b, jaccard).
    */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bandRows: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    // Raw shingles feed both the signature path (no distinct needed
    // under min) and the Jaccard arithmetic — cache once so the corpus
    // is shingled exactly once.
    val raw = shingles(docs, idCol, textCol, shingleLen, distinct = false).cache()
    // Both cached: the band table is self-joined (two subtree copies
    // otherwise), and the candidate set feeds three broadcast subtrees —
    // without storage each consumer re-runs the signature pipeline.
    val sig = bandSignatures(raw, idCol, numHashes, bandRows).cache()
    val cand = candidatePairs(sig, idCol).cache()
    // The Jaccard arithmetic (sizes + intersection) only ever touches
    // docs that appear in a candidate pair — a tiny set. Semi-filter the
    // raw stream down to those docs BEFORE the distinct, so the
    // full-corpus shingle stream is never shuffled for dedup: the only
    // corpus-wide exchange in the whole pipeline is the map-side-combined
    // signature groupBy.
    val candDocs = cand.select(col("doc_a").as(idCol))
      .union(cand.select(col("doc_b").as(idCol))).distinct()
    val sh = raw.join(broadcast(candDocs), Seq(idCol), "left_semi")
      .distinct().cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val shB = sh.select(col(idCol).as("doc_b"), col("sh"))
    val inter = sh.join(broadcast(cand), col(idCol) === col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("sh"))
      .join(shB, Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
    val ja = inter
      .join(sizes.select(col(idCol).as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("nsh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("ni") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
    ja.filter(col("jaccard") >= threshold)
  }

  /** Duplicate clusters from near-dup pairs: connected components by
    * iterative min-label propagation with pointer jumping (labels
    * converge to the smallest doc id in each component). Returns
    * (id, cluster_id, is_rep).
    *
    * Each iteration takes one neighbor-min step (one hop) then one
    * pointer-jump step (`lab <- labels[lab]`), so label information
    * travels two-plus hops per round and convergence is
    * O(log diameter), not O(diameter). Both steps are bounded shuffles
    * over the (tiny) pair graph; the per-iteration driver action only
    * reads a change count off the just-checkpointed result — no
    * re-join.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edgesRaw = pairs.select(col("doc_a").as("n"), col("doc_b").as("m"))
      .union(pairs.select(col("doc_b").as("n"), col("doc_a").as("m")))
      .distinct().cache()
    // The pair graph is tiny relative to the corpus (duplicates are the
    // exception); size the iterative stages to it, not to the corpus'
    // shuffle parallelism — locally that collapses each iteration to a
    // single task, at scale it grows with the edge count.
    val parts = math.max(1, (edgesRaw.count() / 500000L).toInt)
    // localCheckpoint (eager) truncates lineage each step — the
    // standard pattern for iterative algorithms; plain cache() would
    // leave every iteration's plan chained to the full upstream
    // pipeline and risk recomputing it on cache misses.
    val edges = edgesRaw.repartition(parts).localCheckpoint()
    var labels = edges.select(col("n")).distinct()
      .withColumn("lab", col("n")).repartition(parts).localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("n").as("m"), col("lab").as("mlab")), "m")
        .groupBy("n").agg(min("mlab").as("nbr_lab"))
      val stepped = labels.join(nbrMin, Seq("n"), "left")
        .select(col("n"), col("lab").as("old"),
          least(col("lab"), coalesce(col("nbr_lab"), col("lab"))).as("mid"))
      // Pointer jump: labels are node ids, so `labels[mid]` resolves a
      // label to its own (possibly smaller) label — path halving.
      val next = stepped.join(
          labels.select(col("n").as("mid"), col("lab").as("jlab")), Seq("mid"), "left")
        .select(col("n"), col("old"),
          least(col("mid"), coalesce(col("jlab"), col("mid"))).as("lab"))
        .localCheckpoint()
      val changed = next.filter(col("lab") =!= col("old")).count()
      labels = next.select("n", "lab")
      done = changed == 0
      iter += 1
    }
    labels.select(col("n").as("doc_id"), col("lab").as("cluster_id"),
      (col("n") === col("lab")).as("is_rep"))
  }

  /** SimHash over the token stream (all occurrences, not distinct): for
    * each of `bits` positions, sum +1/-1 according to that bit of the
    * token hash; the sign vector packs into one integer signature.
    * Token hash = first 4 md5 hex chars as an int (16 usable bits) so an
    * external engine reproduces it.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    val tokens = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long"))
    val bitSums = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val packed = (0 until bits).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    tokens.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }
}
