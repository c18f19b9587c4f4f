package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, RollingHash}

/** Native rolling_hash expression: codegen path vs interpreted Scala. */
class RollingHashSpec extends SparkSpec {

  test("rolling_hash matches the reference fold, codegen and interpreted") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val samples = Seq("", "a", "hello world", "the quick brown fox", "über-σtring")
    val got = samples.toDF("s")
      .select(col("s"), expr("rolling_hash(s)").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == RollingHash.hash(s), s"mismatch for '$s'")
    }
  }

  test("rolling_hash equals the SQL higher-order fold") {
    GraftFunctions.register(spark)
    val mismatches = Tables.documents(spark, sfDir)
      .selectExpr(
        "rolling_hash(text) AS a",
        """aggregate(transform(split(text, ''), c -> cast(ascii(c) AS LONG)),
          |          cast(0 AS LONG), (a, x) -> (a * 31 + x) % 1000000007) AS b""".stripMargin)
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("array_dot equals the interpreted HOF fold on real embeddings") {
    GraftFunctions.register(spark)
    val hof = """aggregate(zip_with(embedding, embedding,
                |  (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)),
                |  cast(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin
    val mismatches = Tables.embeddings(spark, sfDir)
      .selectExpr("array_dot(embedding, embedding) AS a", s"$hof AS b")
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("array_dot null semantics match zip_with padding") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0))),        // length mismatch → null
      (Some(Seq(1.0, 2.0)), None),                  // null array → null
      (None, Some(Seq(1.0)))).toDF("a", "b")        // null array → null
    val got = rows.selectExpr("array_dot(a, b) AS d")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None, None))
    // mixed float/double inputs: float side widens to double
    val mixed = Seq((Seq(1.5f, 2.5f), Seq(2.0, 4.0))).toDF("f", "d")
      .selectExpr("array_dot(f, d) AS v").collect().head.getDouble(0)
    assert(mixed == 13.0)
  }

  test("optimizer rule rewrites the HOF dot fold to native array_dot") {
    val hof = """aggregate(zip_with(embedding, embedding,
                |  (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)),
                |  cast(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin
    val df = Tables.embeddings(spark, sfDir).selectExpr(s"$hof AS d")
    val want = df.collect().map(_.getDouble(0)).toSeq  // un-rewritten
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq(graft.functions.RewriteArrayDot)
    try {
      val rewritten = Tables.embeddings(spark, sfDir).selectExpr(s"$hof AS d")
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("array_dot"),
        "HOF fold not rewritten")
      assert(rewritten.collect().map(_.getDouble(0)).toSeq == want)
      // a fold with a DIFFERENT merge op must NOT be rewritten
      val other = Tables.embeddings(spark, sfDir).selectExpr(
        """aggregate(zip_with(embedding, embedding,
          |  (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)),
          |  cast(0.0 AS DOUBLE), (acc, v) -> acc - v) AS d""".stripMargin)
      assert(!other.queryExecution.optimizedPlan.toString.contains("array_dot"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("unicode_normalize composes and decomposes; nulls pass through") {
    import spark.implicits._
    import graft.api.Series
    val decomposed = "Café"   // e + combining acute
    val composed = "Caf\u00e9"     // precomposed e-acute
    val df = Seq(Some(decomposed), Some(composed), None).toDF("s")
    val got = df.select(
        Series(col("s")).str.normalize("NFC").col.as("nfc"),
        Series(col("s")).str.normalize("NFD").col.as("nfd"))
      .collect()
    assert(got(0).getString(0) == composed && got(1).getString(0) == composed)
    assert(got(0).getString(1) == decomposed && got(1).getString(1) == decomposed)
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
    // SQL surface via the registry, and form validation
    GraftFunctions.register(spark)
    assert(spark.sql(s"SELECT unicode_normalize('$decomposed', 'NFC') AS n")
      .head().getString(0) == composed)
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
  }

  test("casefold resolves one-to-many folds") {
    import spark.implicits._
    import graft.api.Series
    val got = Seq("Straße", "HELLO").toDF("s")
      .select(Series(col("s")).str.casefold.col).as[String].collect()
    assert(got.toSeq == Seq("strasse", "hello"))
  }

  test("GraftExtensions injects the function set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)   // must not throw; wiring smoke test
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0) ==
      RollingHash.hash("abc"))
  }
}
