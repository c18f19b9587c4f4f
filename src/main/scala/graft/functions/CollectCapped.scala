package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_capped(col, maxSize)`: `collect_list` with a hard per-group
  * buffer bound — the skew-safe primitive behind every "drop groups
  * bigger than the cap" rule in the dedup operators (LSH bucket caps,
  * winnow posting caps; the MOSS "fingerprint in too many documents"
  * discipline, Schleimer et al. SIGMOD 2003 §4; ref
  * dask-expr `_groupby.py` list aggregates for the aggregate shape).
  *
  * Once a buffer holds `maxSize` elements, update() stops even
  * EVALUATING the input and merge() takes only the room that is left,
  * so a degenerate group (boilerplate fingerprint, viral near-dup
  * cluster) costs O(maxSize) memory in every partial buffer, every
  * shuffled buffer, and the final merge — where `collect_list` + a
  * size filter buffers the whole group before dropping it, and a
  * window count ships every posting of the hot key to one reducer.
  * The caller detects an over-cap group by passing `cap + 1`: a
  * result of length `cap + 1` means "more than cap members, contents
  * truncated arbitrarily" (drop it); length ≤ cap is the EXACT member
  * list (order nondeterministic, as collect_list — sort_array for a
  * canonical result). Map-side partial aggregation applies as with
  * any typed imperative aggregate (ObjectHashAggregate).
  */
case class CollectCapped(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(maxSize > 0, s"collect_capped: maxSize must be > 0, got $maxSize")

  override def prettyName: String = "collect_capped"

  override protected lazy val bufferElementType: DataType = child.dataType
  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length >= maxSize) buffer else super.update(buffer, input)

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = maxSize - buffer.length
    if (room <= 0) buffer
    else if (other.length <= room) buffer ++= other
    else buffer ++= other.take(room)
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}

object CollectCapped {
  /** Column surface; registers the SQL function on the active session
    * (idempotent), same contract as [[TDigestQuantile]]. */
  def apply(col: Column, maxSize: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("collect_capped",
      col, org.apache.spark.sql.functions.lit(maxSize))
  }
}
