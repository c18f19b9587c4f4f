package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR): score every doc in
  * a raw pool by how target-like its hashed n-gram profile is, then
  * sample with Gumbel-top-k on the importance weights.
  *
  * Public method (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"): fit two bag-of-hashed-ngram
  * distributions — p over a target corpus, q over the raw pool — and
  * weight each raw doc by log p(d) − log q(d) = Σ_b n_b·λ_b with
  * λ_b = ln(c_t_b+1) − ln(N_t+B) − ln(c_r_b+1) + ln(N_r+B)
  * (add-1 smoothing over B hash buckets). Engine extension beyond the
  * reference's operator list.
  *
  * Scale shape:
  *  - ONE pass over the corpus builds the unigram+bigram feature stream
  *    (map-side explode; no second scan for bigrams);
  *  - per-(doc, bucket) counts shuffle on the doc/bucket pair — the
  *    token stream, once;
  *  - bucket statistics are a B-sized aggregate (B is a constant,
  *    e.g. 4096) joined back by BROADCAST, so the λ table never
  *    shuffles the corpus;
  *  - per-doc weights are one more doc-keyed aggregate; Gumbel-top-k is
  *    a TakeOrdered (no global sort materialization).
  *
  * Hashing is the repo-standard md5 28-bit fold so external engines
  * replay bucket assignment — and the Gumbel noise — bit-for-bit.
  */
object Dsir {

  /** 2^28 — the md5 fold range (see [[graft.functions.TextKernels.P]]'s
    * companion fold); used to map a fold to a uniform in (0,1). */
  private val FoldRange = 268435456.0

  private def fold(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Hashed unigram+bigram feature stream: (doc_id, is_target, bucket,
    * n). One corpus scan; the md5 folds come from the native
    * [[graft.functions.ShingleHashes]] kernel (one codegen'd call per
    * doc per order instead of an interpreted concat+md5 per feature) —
    * same values as `conv(substring(md5(f),1,7),16,10)`. */
  def featureCounts(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(concat(
          graft.functions.ShingleHashes(col(textCol), 1, 7, dedup = false),
          graft.functions.ShingleHashes(col(textCol), 2, 7, dedup = false)))
          .as("__f"))
      .select(col("doc_id"), col("is_target"),
        (col("__f") % buckets).as("bucket"))
      .groupBy("doc_id", "is_target", "bucket")
      .agg(count(lit(1)).as("n"))

  /** Per-raw-doc importance weight log p_target(d) − log q_raw(d).
    * Returns (doc_id, weight) for docs where `isTarget` is false. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    val perDoc = featureCounts(docs, idCol, textCol, isTarget, buckets)
    val bucketStats = perDoc.groupBy("bucket")
      .agg(sum(when(col("is_target"), col("n")).otherwise(lit(0L))).as("ct"),
        sum(when(!col("is_target"), col("n")).otherwise(lit(0L))).as("cr"))
    val totals = bucketStats
      .agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val lam = bucketStats.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log(col("ct") + lit(1.0)) - log(col("nt") + lit(buckets.toDouble)) -
          log(col("cr") + lit(1.0)) + log(col("nr") + lit(buckets.toDouble)))
          .as("lam"))
    perDoc.filter(!col("is_target"))
      .join(broadcast(lam), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("n") * col("lam")).as("weight"))
  }

  /** Gumbel-top-k selection over importance weights: key = w + g where
    * g = −ln(−ln(u)) and u ∈ (0,1) derives from the doc id's md5 fold —
    * deterministic, partition-independent, replayable. Returns
    * (doc_id, weight, sel_key), the k largest keys. */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val u = (fold(col(idCol).cast("string")) + lit(0.5)) / lit(FoldRange)
    weights
      .withColumn("sel_key", col(weightCol) - log(-log(u)))
      .orderBy(col("sel_key").desc, col(idCol))
      .limit(k)
  }
}
