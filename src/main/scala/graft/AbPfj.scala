package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Scratch decomposition probe for prefixFilterJoin (the PPJoin family):
// re-tests the round-12 "pinning perDoc is slower" finding under the
// r17/r18 eager-pin + Pins.sweep discipline, and times a variant that
// skips the candidate distinct in favor of a grouped count.
object AbPfj {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val threshold = 0.8
    val ngram = 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("abpfj").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(path)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def shipped(): DataFrame =
      graft.operators.TextDedup.prefixFilterJoin(docs, "doc_id", "text",
        threshold, ngram)

    // variant: perDoc eagerly pinned, everything downstream reads the pin
    def pinned(): DataFrame = {
      val toks = docs.select(col("doc_id").as("id"),
        explode(graft.functions.ShingleHashes(col("text"), ngram, 7,
          dedup = true)).as("tok"))
      val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      val perDoc = toks.join(dfreq, "tok")
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("dl"))
        .select(col("id"), col("dl"), size(col("dl")).cast("long").as("m"))
        .localCheckpoint(true)
      val prefix = perDoc.select(col("id"), col("m"),
          explode(slice(col("dl"), lit(1),
            (col("m") - ceil(lit(threshold) * col("m")) + 1).cast("int"))).as("e"))
        .select(col("id"), col("e.tok").as("tok"), col("m"))
      val cand = prefix.select(col("id").as("id_a"), col("tok"), col("m").as("m_a"))
        .join(prefix.select(col("id").as("id_b"), col("tok"), col("m").as("m_b")),
          Seq("tok"))
        .filter(col("id_a") < col("id_b") &&
          lit(threshold) * greatest(col("m_a"), col("m_b")).cast("double") <=
            least(col("m_a"), col("m_b")).cast("double"))
        .select("id_a", "id_b", "m_a", "m_b").distinct()
      val sets = perDoc.select(col("id"),
        transform(col("dl"), e => e.getField("tok")).as("ts"))
      cand
        .join(sets.select(col("id").as("id_a"), col("ts").as("ts_a")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("ts").as("ts_b")), "id_b")
        .withColumn("inter", size(array_intersect(col("ts_a"), col("ts_b"))))
        .withColumn("jaccard",
          col("inter") / (col("m_a") + col("m_b") - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "m_a", "m_b", "jaccard")
    }

    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      noop(mk)
      Pins.sweep(spark)
      (System.nanoTime() - t0) / 1e9
    }
    time(shipped()); time(pinned()) // warm-up
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      a += time(shipped()); b += time(pinned())
      println(f"SHIPPED ${a.last}%6.2f  PINNED ${b.last}%6.2f")
    }
    def med(xs: collection.mutable.ArrayBuffer[Double]) =
      xs.sorted.apply(xs.size / 2)
    println(f"SHIPPED med=${med(a)}%.2f min=${a.min}%.2f | PINNED med=${med(b)}%.2f min=${b.min}%.2f")
    spark.stop()
  }
}
