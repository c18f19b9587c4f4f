package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// temporary A/B harness (not committed): window-shape vs agg+join purge tail
object AbPurge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .appName("ab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/tmp/graft_scale/sf1/documents.parquet")
    val idCol = "doc_id"; val textCol = "text"
    val windows = Seq((4, 5L), (8, 2L))
    def wins0 = {
      val src = docs
      val levels = array(windows.map { case (w, mc) =>
        transform(graft.functions.ShingleMd5s(col(textCol), w),
          (h, i) => struct(lit(w).as("w"), lit(mc).as("__mc"),
            i.as("start"), h.as("__h")))
      }: _*)
      src.select(col(idCol), explode(flatten(levels)).as("e"))
        .select(col(idCol), col("e.w").as("w"), col("e.__mc").as("__mc"),
          col("e.start").as("start"), col("e.__h").as("__h"))
    }
    def tail(removed: DataFrame): DataFrame = {
      val covered = removed
        .select(col(idCol),
          explode(sequence(col("start"), col("start") + col("w") - 1)).as("pos"))
        .groupBy(idCol)
        .agg(array_distinct(collect_list(col("pos"))).as("__rmv"))
      docs.select(col(idCol), col(textCol),
          size(split(col(textCol), " ")).cast("long").as("n_words"))
        .join(covered, Seq(idCol), "left")
        .select(col(idCol), col("n_words"),
          coalesce(size(col("__rmv")), lit(0)).cast("long").as("n_removed"),
          when(col("__rmv").isNull, col(textCol))
            .otherwise(graft.functions.RemoveWordPositions(col(textCol), col("__rmv")))
            .as("text_clean"))
    }
    def windowShape: DataFrame = {
      val byHash = org.apache.spark.sql.expressions.Window.partitionBy("__h")
      tail(wins0
        .withColumn("__c", count(lit(1)).over(byHash))
        .withColumn("__first",
          min(struct(col(idCol).as("d"), col("start").as("p"))).over(byHash))
        .filter(col("__c") >= col("__mc"))
        .filter(!(col(idCol) === col("__first.d") && col("start") === col("__first.p"))))
    }
    def aggShape: DataFrame = {
      val stats = wins0.groupBy("__h")
        .agg(count(lit(1)).as("__c"),
          min(struct(col(idCol).as("d"), col("start").as("p"))).as("__first"))
        .filter(col("__c") >= lit(2L))
      tail(wins0.join(stats, Seq("__h"))
        .filter(col("__c") >= col("__mc"))
        .filter(!(col(idCol) === col("__first.d") && col("start") === col("__first.p"))))
    }
    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up both once, then 5 alternating reps
    time(windowShape); time(aggShape)
    val w = collection.mutable.ArrayBuffer[Double]()
    val a = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 5) { w += time(windowShape); a += time(aggShape) }
    println(f"WINDOW med=${w.sorted.apply(2)}%.2f min=${w.min}%.2f all=${w.map(x => f"$x%.2f").mkString(",")}")
    println(f"AGG    med=${a.sorted.apply(2)}%.2f min=${a.min}%.2f all=${a.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
