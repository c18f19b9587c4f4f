package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over the corpus token stream (Cormode &
  * Muthukrishnan 2005): a (depth × width) table of counters where
  * counter (j, h_j(w)) accumulates every occurrence of w; the estimate
  * for a word is the MIN over its depth cells — always an
  * OVER-estimate, with error ≤ 2N/width at probability 1 − 2^−depth.
  *
  * Built as a DataFrame, not an opaque buffer: the sketch IS a
  * (depth·width)-row table produced by one bounded groupBy, so it
  * merges across corpora/streams by a further sum (mergeability is the
  * point of the structure), persists as parquet, and stays
  * oracle-replayable. The hash family is the repo-standard md5 28-bit
  * fold + affine mixes ([[TextDedup.mixConsts]]), so an external engine
  * reproduces every cell.
  *
  * Scale shape: token counts first (one shuffle, Zipf-bounded vocab),
  * then depth rows per DISTINCT word into the (j, bucket) aggregate —
  * sketch construction never touches the raw token stream more than
  * once, and the sketch itself is O(depth·width) regardless of corpus
  * size. Point queries join the sketch by (j, bucket) — broadcast, the
  * sketch is tiny.
  */
object Sketches {

  private def fold(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Bucket of word `w` in hash row `j`: ((fold·a_j + b_j) mod P) mod width. */
  private def bucket(w: Column, a: Long, b: Long, width: Int): Column =
    ((fold(w) * a + b) % TextDedup.P) % width

  /** The sketch table: (j, bkt, s) with depth·width rows (absent cells
    * are zero). `wordCounts` is (w, c) — counts per distinct word. */
  def countMinBuild(wordCounts: DataFrame, depth: Int, width: Int): DataFrame = {
    val mixes = TextDedup.mixConsts(depth)
    val cells = mixes.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("j"), bucket(col("w"), a, b, width).as("bkt"))
    }
    wordCounts
      .select(explode(array(cells: _*)).as("cell"), col("c"))
      .groupBy(col("cell.j").as("j"), col("cell.bkt").as("bkt"))
      .agg(sum("c").as("s"))
  }

  /** Estimate counts for `probes` (a (w) DataFrame) against a sketch:
    * (w, n_est = min over depth cells). The sketch is broadcast. */
  def countMinQuery(sketch: DataFrame, probes: DataFrame, depth: Int,
      width: Int): DataFrame = {
    val mixes = TextDedup.mixConsts(depth)
    val cells = mixes.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("j"), bucket(col("w"), a, b, width).as("bkt"))
    }
    probes
      .select(col("w"), explode(array(cells: _*)).as("cell"))
      .join(broadcast(sketch),
        col("cell.j") === col("j") && col("cell.bkt") === col("bkt"))
      .groupBy("w").agg(min("s").as("n_est"))
  }
}
