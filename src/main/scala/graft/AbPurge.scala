package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// A/B harness for the substring-purge occurrence-stats tail:
//   window  = count/min over Window.partitionBy(__h)   (r15 shape — concentrates hot keys)
//   agg     = groupBy(__h) stats + join back, unpinned  (r16 shape — recomputes kernel + 2nd exchange)
//   pinned  = repartition(__h) reused by stats AND probe (rejected — re-concentrates hot keys)
//   docpin  = localCheckpoint on the kernel's own doc-clustered output
//             (r17 shipped shape — kernel once, both __h exchanges fresh)
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
    def aggShape(mode: String): DataFrame = {
      val w0 = mode match {
        case "hashpin" => wins0.repartition(col("__h"))
        case "docpin"  => wins0.localCheckpoint(false)
        case _         => wins0
      }
      val stats = w0.groupBy("__h")
        .agg(count(lit(1)).as("__c"),
          min(struct(col(idCol).as("d"), col("start").as("p"))).as("__first"))
        .filter(col("__c") >= lit(2L))
      tail(w0.join(stats, Seq("__h"))
        .filter(col("__c") >= col("__mc"))
        .filter(!(col(idCol) === col("__first.d") && col("start") === col("__first.p"))))
    }
    // gated = the measured-gate tail: pin stream, materialize the
    // skew-safe stats once (probe action reads max posting count +
    // dict rows), then pick the join shape from the measurement —
    // broadcast (dict tiny) / co-partitioned repartition (hot groups
    // bounded) / fresh AQE-skew-split exchange (unbounded hot hash).
    def gatedShape(pinStats: Boolean): DataFrame = {
      val pinned = wins0.localCheckpoint(false)
      def statsOf = pinned.groupBy("__h")
        .agg(count(lit(1)).as("__c"),
          min(struct(col(idCol).as("d"), col("start").as("p"))).as("__first"))
        .filter(col("__c") >= lit(2L))
      val statsPin = if (pinStats) statsOf.localCheckpoint(false) else statsOf
      val probe = statsPin.agg(max(col("__c")), count(lit(1))).head
      val maxC = if (probe.isNullAt(0)) 0L else probe.getLong(0)
      val nDict = probe.getLong(1)
      println(s"[gate] maxC=$maxC nDict=$nDict")
      // probe the SHIPPED gate boundaries (TextDedup.BroadcastDictRows /
      // HotGroupRows) so GATEDSP/GATEDRE measure the same break-points
      // the production purgeFromWindows routes on
      val base =
        if (nDict <= graft.operators.TextDedup.BroadcastDictRows) pinned
        else if (maxC <= graft.operators.TextDedup.HotGroupRows)
          pinned.repartition(col("__h"))
        else pinned
      val statsSide =
        if (nDict <= graft.operators.TextDedup.BroadcastDictRows)
          broadcast(statsPin)
        else statsPin
      tail(base.join(statsSide, Seq("__h"))
        .filter(col("__c") >= col("__mc"))
        .filter(!(col(idCol) === col("__first.d") && col("start") === col("__first.p"))))
    }
    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      Pins.sweep(spark)
      (System.nanoTime() - t0) / 1e9
    }
    def shipped: DataFrame =
      graft.operators.TextDedup.purgeDuplicateSubstringsMulti(
        docs, idCol, textCol, windows, keepFirst = true)
    time(windowShape); time(aggShape("plain")); time(aggShape("hashpin")); time(aggShape("docpin"))
    time(gatedShape(true)); time(gatedShape(false)); time(shipped) // warm-up
    val w = collection.mutable.ArrayBuffer[Double]()
    val a = collection.mutable.ArrayBuffer[Double]()
    val p = collection.mutable.ArrayBuffer[Double]()
    val d = collection.mutable.ArrayBuffer[Double]()
    val gp = collection.mutable.ArrayBuffer[Double]()
    val gr = collection.mutable.ArrayBuffer[Double]()
    val sh = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) {
      w += time(windowShape); a += time(aggShape("plain"))
      p += time(aggShape("hashpin")); d += time(aggShape("docpin"))
      gp += time(gatedShape(true)); gr += time(gatedShape(false))
      sh += time(shipped)
    }
    def rep(n: String, xs: collection.mutable.ArrayBuffer[Double]): Unit =
      println(f"$n med=${xs.sorted.apply(xs.size / 2)}%.2f min=${xs.min}%.2f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    rep("WINDOW ", w); rep("AGG    ", a); rep("HASHPIN", p); rep("DOCPIN ", d)
    rep("GATEDSP", gp); rep("GATEDRE", gr); rep("SHIPPED", sh)
    spark.stop()
  }
}
