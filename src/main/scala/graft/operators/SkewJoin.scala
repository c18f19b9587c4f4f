package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the explicit fallback when AQE's
  * runtime skew splitting isn't available (e.g. a deliberately
  * partitioned pipeline stage, or a storage-partitioned join that AQE
  * won't touch).
  *
  * The skewed (large) side gets a deterministic salt derived from its
  * whole row, spreading one hot key across `saltFactor` shuffle
  * partitions; the small side is replicated `saltFactor`× via a
  * literal-array explode (no extra shuffle — replication happens in the
  * map stage). Join output is identical to the unsalted join.
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    val saltCol = "__graft_salt"
    // xxhash64 over all large-side columns: deterministic, and uniform
    // even when the join key itself is constant (the skew case).
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = small.withColumn(saltCol,
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Bloom-pruned equi-join: build a Bloom filter over the SMALL
    * side's join keys, filter the BIG side with a stateless inline
    * membership projection BEFORE its shuffle, then join. Join output
    * is identical to the plain join (a Bloom filter has no false
    * negatives; false positives only let a few doomed rows through to
    * the join, p ≈ (1 − e^(−hashes·n/bits))^hashes).
    *
    * This is the explicit form of Spark's runtime bloom-filter join
    * pruning, for when the planner can't inject it (non-obvious
    * selectivity, pre-partitioned stages): at 100 TB the win is that
    * the big side's shuffle carries only rows whose keys might match —
    * a selective small side turns a full-corpus exchange into a
    * trickle. Driver state is the packed filter (bits/8 bytes — 2²⁰
    * bits = 128 KiB), the same O(sketch) bound every sketch consumer
    * pays; the filter rides into the plan as a literal, so the prune
    * is codegen'd and shuffle-free.
    *
    * `joinType` must be inner or left_semi — types that tolerate
    * pruning non-matching left rows. */
  def bloomPrunedJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      bits: Int = 1 << 20,
      hashes: Int = 4,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi", "semi").contains(joinType),
      s"bloomPrunedJoin supports inner/left_semi, got $joinType")
    // The md5-based bit positions hash STRINGS; both sides go through
    // the same cast so integer keys agree on representation.
    val bloom = Sketches.bloomBuild(
      small.select(col(smallKey).cast("string").as(smallKey)), smallKey,
      bits, hashes)
    val packed = Sketches.packBits(bloom, bits)
    val pruned = big.filter(
      Sketches.mightContainInline(col(bigKey).cast("string"), packed,
        bits, hashes))
    pruned.join(small, col(bigKey) === col(smallKey), joinType)
  }
}
