package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Structured-streaming operator tests over MemoryStream sources. */
class StreamingSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000)

  test("windowed stats aggregate a stream incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val df = in.toDF().toDF("sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val agg = StreamOps.windowedStats(df, "ts", "value", "10 seconds", "5 seconds")
    val q = agg.writeStream.format("memory").queryName("win_stats")
      .outputMode("complete").start()
    try {
      in.addData((1L, 1.0), (2L, 2.0), (11L, 10.0), (12L, 20.0))
      q.processAllAvailable()
      val rows = spark.table("win_stats").orderBy("window_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 2 && rows(0).getAs[Double]("total") == 3.0)
      assert(rows(1).getAs[Long]("n") == 2 && rows(1).getAs[Double]("total") == 30.0)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("sec", "content_hash")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val dedup = StreamOps.streamingDedup(df, "ts", "1 minute", Seq("content_hash"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"), (5L, "bbb"))
      q.processAllAvailable()
      val hashes = spark.table("dedup_out").select("content_hash")
        .as[String].collect().sorted.toSeq
      assert(hashes == Seq("aaa", "bbb", "ccc"))
    } finally q.stop()
  }

  test("session windows split on the inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val df = in.toDF().toDF("user", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val sess = StreamOps.sessionCounts(df, "ts", "user", "10 seconds", "5 seconds")
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      // user 7: events at 0s,5s (one session) then 60s (a second session)
      in.addData((7L, 0L), (7L, 5L), (7L, 60L))
      q.processAllAvailable()
      val rows = spark.table("sessions").orderBy("session_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_events") == 2)
      assert(rows(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val out = StreamOps.runningTotals(in.toDS())
    val q = out.writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      in.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      in.addData((1L, 5.0))
      q.processAllAvailable()
      val last = spark.table("running").as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      assert(last(1L) == ((1L, 3L, 10.0)))
      assert(last(2L) == ((2L, 1L, 10.0)))
    } finally q.stop()
  }
}
