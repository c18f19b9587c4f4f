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

  /** Distinct word n-gram shingles: (id, sh). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val ws = split(col(textCol), " ")
    docs.select(col(idCol),
      explode(when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
        .otherwise(array())).as("sh"))
      .distinct()
  }

  /** MinHash signature rows: (id, i, mh) for i in [0, k).
    * mh_i = min over shingles of md5(i || '|' || shingle); the min is a
    * decomposable aggregate, so Spark computes it map-side first.
    */
  def minHash(sh: DataFrame, idCol: String, k: Int): DataFrame =
    sh.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(k - 1)),
          i => md5(concat(i.cast("string"), lit("|"), col("sh"))))).as(Seq("i", "h")))
      .groupBy(col(idCol), col("i"))
      .agg(min("h").as("mh"))

  /** Banded signatures: (id, band, sig) with r minhashes concatenated per
    * band in hash-index order.
    */
  def bandSignatures(mh: DataFrame, idCol: String, r: Int): DataFrame =
    mh.groupBy(col(idCol), (col("i") / r).cast("int").as("band"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          x => x.getField("mh"))).as("sig"))

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
    val sh = shingles(docs, idCol, textCol, shingleLen)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val cand = candidatePairs(bandSignatures(minHash(sh, idCol, numHashes), idCol, bandRows), idCol)
    // Candidate set is tiny relative to the corpus — broadcast it so the
    // intersection count is two broadcast joins over the shingle table.
    val inter = sh.join(broadcast(cand), col(idCol) === col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("sh"))
      .join(sh.select(col(idCol).as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
    val ja = inter
      .join(sizes.select(col(idCol).as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("nsh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("ni") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
    ja.filter(col("jaccard") >= threshold)
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
