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
}
