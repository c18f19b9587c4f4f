package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// A/B harness for the substring-purge occurrence-stats tail:
//   window  = count/min over Window.partitionBy(__h)   (r15 shape — concentrates hot keys)
//   agg     = groupBy(__h) stats + join back, unpinned  (probe recomputes kernel + 2nd exchange)
//   pinned  = repartition(__h) reused by stats AND probe (shipped shape)
// Usage: runMain graft.AbPurge <documents.parquet> [reps]
object AbPurge {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_scale/sf1/documents.parquet"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .appName("ab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // "degenerate:N" = the boilerplate regime the skew fix targets: N
    // docs ALL sharing one 12-word license line (plus 6 unique words),
    // so each shared window hash owns an N-row posting list — the
    // window shape ships every one of them into a single task's sort.
    val docs =
      if (path.startsWith("degenerate:")) {
        val n = path.stripPrefix("degenerate:").toInt
        val license = "this document is provided as is without warranty of any kind whatsoever"
        spark.range(n).select(col("id").as("doc_id"),
          concat(lit(license + " "),
            concat_ws(" ", (0 until 6).map(i =>
              concat(lit(s"u$i"), (col("id") * 7 + i) % 99991)): _*)).as("text"))
          .repartition(32)
      } else spark.read.parquet(path)
    val idCol = "doc_id"; val textCol = "text"
    val windows = Seq((4, 5L), (8, 2L))
    def wins0 = {
      val src = docs
      val levels = array(windows.map { case (w, mc) =>
        transform(graft.functions.ShingleMd5Bins(col(textCol), w),
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
    def aggShape(pin: Boolean): DataFrame = {
      val w0 = if (pin) wins0.repartition(col("__h")) else wins0
      val stats = w0.groupBy("__h")
        .agg(count(lit(1)).as("__c"),
          min(struct(col(idCol).as("d"), col("start").as("p"))).as("__first"))
        .filter(col("__c") >= lit(2L))
      tail(w0.join(stats, Seq("__h"))
        .filter(col("__c") >= col("__mc"))
        .filter(!(col(idCol) === col("__first.d") && col("start") === col("__first.p"))))
    }
    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(windowShape); time(aggShape(false)); time(aggShape(true)) // warm-up
    val w = collection.mutable.ArrayBuffer[Double]()
    val a = collection.mutable.ArrayBuffer[Double]()
    val p = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) {
      w += time(windowShape); a += time(aggShape(false)); p += time(aggShape(true))
    }
    def rep(n: String, xs: collection.mutable.ArrayBuffer[Double]): Unit =
      println(f"$n med=${xs.sorted.apply(xs.size / 2)}%.2f min=${xs.min}%.2f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    rep("WINDOW", w); rep("AGG   ", a); rep("PINNED", p)
    spark.stop()
  }
}
