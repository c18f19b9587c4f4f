package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Io

/** IO-breadth coverage: every roundtrip writes through the named sink
  * and reads back through the named source, then the oracle compares
  * the result against the original table — proving both directions
  * preserve values. Files land under target/io (inside the repo).
  */
object IoQueries {

  private val ioDir = "/root/repo/target/io"

  def registerAll(reg: (String, Option[String], (SparkSession, String) => DataFrame) => Unit): Unit = {

    def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Unit =
      reg(name, Some(oracle), fn)

    // FromMap / FromMapProjectable (reference io/io.py:218-386): the
    // DSv2 generator source. Requested columns are PUSHED INTO the
    // generator (payload is never computed here) and the seq-range
    // predicate is pushed into partition planning (rows outside
    // [500, 1500) are never generated) — asserted behaviorally in
    // MapSourceSpec. The oracle replays the md5-derived generator.
    q("q_from_map_source",
      """SELECT i AS seq,
        |  'k' || (CAST('0x' || substr(md5('k|' || i), 1, 4) AS BIGINT) % 10) AS key,
        |  CAST('0x' || substr(md5('v|' || i), 1, 8) AS BIGINT) / 4294967296.0 AS value
        |FROM generate_series(0, 1999) t(i)
        |WHERE i >= 500 AND i < 1500
        |ORDER BY seq""".stripMargin) { (s, dir) =>
      Io.readMap(s, rows = 2000, partitions = 8)
        .filter(col("seq") >= 500 && col("seq") < 1500)
        .select("seq", "key", "value")
        .orderBy("seq")
    }

    // XML roundtrip (Spark 4 built-in xml source; format-breadth
    // extension beyond the reference's list). Oracle reads the parquet
    // source — the roundtrip must be lossless to match.
    q("q_xml_roundtrip",
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val supplier = Tables.supplier(s, dir)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      val path = s"$ioDir/xml_supplier"
      Io.writeXml(supplier, path, rowTag = "supplier")
      Io.readXml(s, path, rowTag = "supplier", schema = supplier.schema)
        .orderBy("s_suppkey")
    }

    // read_csv / to_csv (reference _collection.py:5092, io/csv.py:1).
    q("q_csv_roundtrip",
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val nation = Tables.nation(s, dir)
      val path = s"$ioDir/csv_nation"
      Io.writeCsv(nation, path)
      Io.readCsv(s, path, schema = nation.schema)
        .orderBy("n_nationkey")
    }

    // read_fwf (reference _collection.py:5092-5150, delegating to the
    // tabular text layer exactly as this shim does): write the dimension
    // fixed-width, read it back through colspec substring projections
    // with schema casts.
    q("q_fwf_roundtrip",
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val nation = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
      val path = s"$ioDir/fwf_nation"
      Io.writeFwf(nation, path, Seq(4, 20, 4))
      Io.readFwf(s, path,
          Seq(("n_nationkey", 0, 4), ("n_name", 4, 24), ("n_regionkey", 24, 28)),
          schema = nation.schema)
        .orderBy("n_nationkey")
    }

    // read_json / to_json (reference io/json.py:9-117). Dates travel as
    // formatted strings so the roundtrip is timezone-independent.
    q("q_json_roundtrip",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_day
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val sub = Tables.orders(s, dir).filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
      val path = s"$ioDir/json_orders"
      Io.writeJson(sub, path)
      Io.readJson(s, path, schema = sub.schema).orderBy("o_orderkey")
    }

    // read_orc / to_orc (reference io/orc.py:5-60).
    q("q_orc_roundtrip",
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_price
        |FROM lineitem WHERE l_orderkey < 2000
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val sub = Tables.lineitem(s, dir).filter(col("l_orderkey") < 2000)
      val path = s"$ioDir/orc_lineitem"
      Io.writeOrc(sub, path)
      Io.readOrc(s, path)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_price"))
        .orderBy("l_returnflag")
    }

    // to_parquet sink + read_parquet source (reference io/parquet.py:337).
    q("q_parquet_roundtrip",
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val sub = Tables.customer(s, dir).filter(col("c_custkey") < 500)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val path = s"$ioDir/parquet_customer"
      Io.writeParquet(sub, path)
      Io.readParquet(s, path).orderBy("c_custkey")
    }

    // read_text / to_text: line-oriented corpus IO (the raw form LLM
    // text pipelines start from).
    // Hive-style partitioned layout: the write creates one directory
    // per o_orderpriority; the read-back filter prunes non-matching
    // partitions at PLANNING time (PartitionFilters — asserted in
    // LayoutSpec), so at scale the unselected directories cost zero IO.
    q("q_partitioned_pruning",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_totalprice) AS DOUBLE) AS total
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val path = s"$ioDir/orders_partitioned"
      graft.sources.Layout.writePartitioned(
        Tables.orders(s, dir), path, "o_orderpriority")
      Io.readParquet(s, path)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("o_totalprice").cast("double").as("total"))
        .orderBy("o_orderpriority")
    }

    q("q_text_roundtrip",
      """SELECT count(*) AS n_lines, CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  min(md5(text)) AS min_h
        |FROM documents""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("text"))
      val path = s"$ioDir/text_documents"
      Io.writeText(docs, path)
      Io.readText(s, path)
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("value"))).as("total_chars"),
          min(md5(col("value"))).as("min_h"))
    }

    // read_sql / to_sql (reference io/sql.py:1-222) against embedded
    // Derby: full write+read roundtrip through a real JDBC dialect.
    q("q_jdbc_roundtrip",
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val url = s"jdbc:derby:$ioDir/derbydb;create=true"
      val sub = Tables.supplier(s, dir).select("s_suppkey", "s_name", "s_acctbal")
      Io.writeJdbc(sub, url, "supplier_rt")
      Io.readJdbc(s, url, "supplier_rt").orderBy("s_suppkey")
    }

    // In-memory source (reference io/io.py:218-386 FromScalars/FromMap,
    // from_pandas): local rows become a distributed frame.
    q("q_from_memory",
      """SELECT * FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5),
        |  (3, 'gamma', 3.5)) t(id, name, score) ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Seq((1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", 3.5))
        .toDF("id", "name", "score").orderBy("id")
    }

    // Deterministic synthetic timeseries source (reference datasets.py:17
    // `timeseries`): md5-derived pseudo-randoms so any engine can
    // regenerate the identical frame. Generation is spark.range — fully
    // parallel, no driver materialization.
    q("q_timeseries",
      """SELECT i AS tick,
        |  TIMESTAMP '2000-01-01 00:00:00' + to_seconds(i) AS ts,
        |  1000 + CAST('0x' || substr(md5('id|' || CAST(i AS VARCHAR)), 1, 4) AS BIGINT) % 1000 AS id,
        |  (CAST('0x' || substr(md5('x|' || CAST(i AS VARCHAR)), 1, 8) AS BIGINT)
        |     - CAST(2147483648 AS DOUBLE)) / CAST(2147483648 AS DOUBLE) AS x
        |FROM (SELECT unnest(generate_series(0, 3599)) AS i)
        |ORDER BY tick""".stripMargin) { (s, dir) =>
      Datasets.timeseries(s, n = 3600).orderBy("tick")
    }

    // Repartition family (reference _repartition.py:21-498): content is
    // invariant under repartition(n) / repartitionByRange / coalesce —
    // the oracle proves it.
    q("q_repartition_roundtrip",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey < 3000 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderkey") < 3000)
        .select("o_orderkey", "o_totalprice")
        .repartition(7)
        .repartitionByRange(4, col("o_orderkey"))
        .coalesce(2)
        .orderBy("o_orderkey")
    }
  }
}
