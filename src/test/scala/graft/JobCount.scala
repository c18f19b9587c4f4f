package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

object JobCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        n.incrementAndGet()
        println(s"[job] stages=${js.stageInfos.map(_.numTasks).mkString("+")} : ${js.stageInfos.map(_.name).mkString(" | ").take(200)}")
      }
    })
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // warm-up
    graft.operators.TextDedup.nearDuplicates(docs, "doc_id", "text", 3, 16, 4, 0.8)
      .orderBy("doc_a", "doc_b").collect()
    Thread.sleep(500)
    println("[job] ===== RESET =====")
    n.set(0)
    graft.operators.TextDedup.nearDuplicates(docs, "doc_id", "text", 3, 16, 4, 0.8)
      .orderBy("doc_a", "doc_b").collect()
    Thread.sleep(500)
    println(s"[jobcount] steady-state jobs = ${n.get()}")
    spark.stop()
  }
}
