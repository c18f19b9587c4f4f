package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryProgress}

/** Runtime observability for streaming queries — the streaming analogue
  * of `Explain.analyzeStats` (which walks a batch plan's SQL metrics):
  * each `StreamingQueryProgress` event flattens into one row PER STATE
  * OPERATOR carrying throughput (input rows, rows/sec), state size
  * (rows kept/updated, bytes), and event-time position (watermark, and
  * how far it lags the newest observed event). Stateless micro-batches
  * still produce one `(query)` row, so throughput is observable for
  * map-only streams too.
  *
  * Everything derives from the public progress API (`recentProgress`) —
  * no listener registration, no driver state: call it whenever, get the
  * last ~100 batches. `progressFrame` wraps the rows as a LocalRelation
  * DataFrame so operability queries (lag over time, state growth per
  * operator) are ordinary DataFrame queries.
  */
object StreamObs {

  /** One progress observation: a (micro-batch, state operator) pair.
    * `stateRows*`/`stateMemoryBytes` are None for the stateless
    * `(query)` row; `watermark`/`watermarkDelayMs` are None until the
    * query has one (delay = newest observed event time − watermark —
    * how much reorder headroom the state is currently buying). */
  final case class StreamProgressRow(
      batchId: Long,
      operator: String,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      stateRowsTotal: Option[Long],
      stateRowsUpdated: Option[Long],
      stateRowsRemoved: Option[Long],
      stateMemoryBytes: Option[Long],
      watermark: Option[java.sql.Timestamp],
      watermarkDelayMs: Option[Long],
      triggerDurationMs: Option[Long])

  private def parseTs(s: String): Option[java.sql.Timestamp] =
    try {
      val inst = java.time.Instant.parse(s)
      // epoch = "no watermark yet", not a real event-time position
      if (inst.toEpochMilli == 0L) None
      else Some(java.sql.Timestamp.from(inst))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Flatten one progress event into per-operator rows. */
  def rowsOf(p: StreamingQueryProgress): Seq[StreamProgressRow] = {
    val wm = Option(p.eventTime.get("watermark")).flatMap(parseTs)
    val maxEvent = Option(p.eventTime.get("max")).flatMap(parseTs)
    val delay = for (w <- wm; m <- maxEvent)
      yield math.max(m.getTime - w.getTime, 0L)
    val trigger = Option(p.durationMs.get("triggerExecution")).map(_.longValue)
    // NaN rates (first batch, idle trigger) normalize to 0 so the rows
    // aggregate cleanly downstream
    def rate(d: Double): Double = if (d.isNaN) 0.0 else d
    val base = StreamProgressRow(p.batchId, "(query)", p.numInputRows,
      rate(p.inputRowsPerSecond), rate(p.processedRowsPerSecond),
      None, None, None, None, wm, delay, trigger)
    val ops = p.stateOperators.toSeq.map { so =>
      base.copy(operator = so.operatorName,
        stateRowsTotal = Some(so.numRowsTotal),
        stateRowsUpdated = Some(so.numRowsUpdated),
        stateRowsRemoved = Some(so.numRowsRemoved),
        stateMemoryBytes = Some(so.memoryUsedBytes))
    }
    if (ops.isEmpty) Seq(base) else ops
  }

  /** All per-operator rows from the query's retained progress history
    * (newest-last; Spark keeps ~the last 100 batches). */
  def progressRows(q: StreamingQuery): Seq[StreamProgressRow] =
    q.recentProgress.toSeq.sortBy(_.batchId).flatMap(rowsOf)

  /** The same rows as a LocalRelation DataFrame — join/window/aggregate
    * them like any other table (no jobs run to build it). */
  def progressFrame(spark: SparkSession, q: StreamingQuery): DataFrame = {
    import spark.implicits._
    progressRows(q).toDF()
  }
}
