package graft

import org.apache.spark.sql.functions._
import graft.sources.{Io, MapSource}

/** The DSv2 generator source: correctness plus BEHAVIORAL proof that
  * projection and filter pushdown reach the generator (counters are
  * JVM-global — valid in local mode where executors share the JVM).
  */
class MapSourceSpec extends SparkSpec {

  test("generates the full deterministic table") {
    val df = Io.readMap(spark, rows = 100, partitions = 7)
    assert(df.count() == 100)
    val r = df.filter(col("seq") === 42L).head()
    assert(r.getString(1) == MapSource.keyOf(42))
    assert(r.getDouble(2) == MapSource.valueOf(42))
    assert(r.getString(3).length == 64)
  }

  test("column pruning reaches the generator: payload never computed") {
    MapSource.payloadsComputed.set(0)
    val got = Io.readMap(spark, rows = 500, partitions = 4)
      .select("seq", "value").agg(sum("value")).head().getDouble(0)
    assert(got > 0)
    assert(MapSource.payloadsComputed.get() == 0,
      s"payload computed ${MapSource.payloadsComputed.get()} times despite pruning")
    // and it IS computed when requested
    Io.readMap(spark, rows = 10, partitions = 1).select("payload").collect()
    assert(MapSource.payloadsComputed.get() == 10)
  }

  test("seq-range filters push into partition planning: rows never generated") {
    MapSource.rowsEmitted.set(0)
    val n = Io.readMap(spark, rows = 10000, partitions = 8)
      .filter(col("seq") >= 9900L && col("seq") < 9950L)
      .count()
    assert(n == 50)
    assert(MapSource.rowsEmitted.get() == 50,
      s"generated ${MapSource.rowsEmitted.get()} rows for a 50-row slice")
  }

  test("unsupported predicates still evaluate correctly post-scan") {
    val n = Io.readMap(spark, rows = 1000, partitions = 4)
      .filter(col("key") === "k3").count()
    val want = (0L until 1000L).count(i => MapSource.keyOf(i) == "k3")
    assert(n == want)
  }
}
