package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// Scratch decomposition probe for the substring-purge tail (AbPurge's
// sibling): times the candidate gated shape with internal phase marks.
object AbDecomp {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("abd").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
      val levels = array(windows.map { case (w, mc) =>
        transform(graft.functions.ShingleMd5Bins(col(textCol), w),
          (h, i) => struct(lit(w).as("w"), lit(mc).as("__mc"),
            i.as("start"), h.as("__h")))
      }: _*)
      docs.select(col(idCol), explode(flatten(levels)).as("e"))
        .select(col(idCol), col("e.w").as("w"), col("e.__mc").as("__mc"),
          col("e.start").as("start"), col("e.__h").as("__h"))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def composed(verbose: Boolean, mode: String): DataFrame = {
      val t0 = System.nanoTime()
      val pinned = wins0.localCheckpoint()
      val t1 = System.nanoTime()
      def statsDf =
        if (mode.contains("packed"))
          pinned.groupBy("__h")
            .agg(count(lit(1)).as("__c"),
              min(col(idCol) * lit(1048576L) + col("start")).as("__first"))
            .filter(col("__c") >= lit(2L))
        else
          pinned.groupBy("__h")
            .agg(count(lit(1)).as("__c"),
              min(struct(col(idCol).as("d"), col("start").as("p"))).as("__first"))
            .filter(col("__c") >= lit(2L))
      val stats = if (mode.contains("nopin")) statsDf else statsDf.localCheckpoint(false)
      val probe = stats.agg(max(col("__c")), count(lit(1))).head
      val t2 = System.nanoTime()
      val maxC = if (probe.isNullAt(0)) 0L else probe.getLong(0)
      val nDict = probe.getLong(1)
      if (verbose)
        println(f"  [$mode] pin=${(t1 - t0) / 1e9}%.2f statsprobe=${(t2 - t1) / 1e9}%.2f maxC=$maxC nDict=$nDict")
      val joined =
        if (nDict <= (1L << 20)) pinned.join(broadcast(stats), Seq("__h"))
        else if (maxC <= (1L << 16))
          pinned.repartition(col("__h")).join(stats, Seq("__h"))
        else pinned.join(stats, Seq("__h"))
      val removed = joined
        .filter(col("__c") >= col("__mc"))
        .filter(if (mode.contains("packed"))
          !(col(idCol) * lit(1048576L) + col("start") === col("__first"))
        else
          !(col(idCol) === col("__first.d") && col("start") === col("__first.p")))
      val covered = removed
        .select(col(idCol),
          sequence(col("start"), col("start") + col("w") - 1).as("ps"))
        .groupBy(idCol)
        .agg(array_distinct(flatten(collect_list(col("ps")))).as("__rmv"))
      docs.select(col(idCol), col(textCol),
          size(split(col(textCol), " ")).cast("long").as("n_words"))
        .join(covered, Seq(idCol), "left")
        .select(col(idCol), col("n_words"),
          coalesce(size(col("__rmv")), lit(0)).cast("long").as("n_removed"),
          when(col("__rmv").isNull, col(textCol))
            .otherwise(graft.functions.RemoveWordPositions(col(textCol), col("__rmv")))
            .as("text_clean"))
    }
    for (mode <- Seq("base", "nopin", "packed", "packed+nopin")) {
      noop(composed(false, mode)); Pins.sweep(spark) // warm
      val xs = collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        noop(composed(true, mode))
        xs += (System.nanoTime() - t0) / 1e9
        Pins.sweep(spark)
      }
      println(f"COMPOSED[$mode] med=${xs.sorted.apply(xs.size / 2)}%.2f min=${xs.min}%.2f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
