package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operator-coverage query registry (SURVEY.md §2).
  *
  * Each entry is a Spark-first DataFrame program over the TESTDATA
  * tables plus a DuckDB oracle with identically-named output columns.
  * Registration happens via the small `register` helper so the two
  * maps cannot drift apart.
  */
object Queries {

  private val reg = scala.collection.mutable.LinkedHashMap
    .empty[String, (SparkSession, String) => DataFrame]
  private val ora = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def register(name: String, oracle: Option[String])(
      fn: (SparkSession, String) => DataFrame): Unit = {
    reg += name -> fn
    oracle.foreach(sql => ora += name -> sql)
  }
  private def q(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    register(name, Some(oracle))(fn)
  private def qNoOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    register(name, None)(fn)

  def all: Map[String, (SparkSession, String) => DataFrame] = reg.toMap
  def oracles: Map[String, String] = ora.toMap

  // ---------------------------------------------------------------
  // §2.1 + §2.4 + §2.7 — flagship: scan → filter → agg → sort
  // (TPC-H Q1 shape; reference lifecycle SURVEY §3.1/§3.3)
  // ---------------------------------------------------------------
  def q1_pricing_summary(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        avg("l_quantity").as("avg_qty"),
        avg("l_extendedprice").as("avg_price"),
        avg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** DuckDB-side mirror of Tables.events's nanos→micros conversion. */
  val EVENTS_SQL: String =
    "(SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts, " +
      "user_id, event_type, value, props FROM events) AS events"

  q("q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(l_extendedprice) AS sum_base_price,
      |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
      |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
      |  avg(l_quantity) AS avg_qty,
      |  avg(l_extendedprice) AS avg_price,
      |  avg(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)(q1_pricing_summary _)

  // ---------------------------------------------------------------
  // §2.2 Projections / filters / row ops
  // ---------------------------------------------------------------

  // Projection + Filter (reference _expr.py:2048 Projection, :1996 Filter);
  // both reach the parquet scan via Catalyst pushdown.
  q("q_projection_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_discount < 0.02
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 && col("l_discount") < 0.02)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // Assign / elemwise binops (reference _expr.py:1852 Assign, :2614 Binop).
  q("q_assign_arithmetic",
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) AS disc_price,
      |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
      |  l_quantity + l_linenumber AS qty_plus,
      |  l_extendedprice / l_quantity AS unit_price,
      |  l_orderkey % 7 AS key_mod,
      |  floor(l_quantity / 5) AS qty_div5,
      |  power(l_discount, 2) AS disc_sq,
      |  -l_tax AS neg_tax
      |FROM lineitem
      |WHERE l_orderkey < 2000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 2000)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"),
        (col("l_quantity") + col("l_linenumber")).as("qty_plus"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        (col("l_orderkey") % 7).as("key_mod"),
        floor(col("l_quantity") / 5).as("qty_div5"),
        pow(col("l_discount"), 2).as("disc_sq"),
        (-col("l_tax")).as("neg_tax"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // CaseWhen (reference _expr.py:1966) + comparison ops.
  q("q_case_when",
    """SELECT CASE WHEN l_quantity < 10 THEN 'low'
      |            WHEN l_quantity < 30 THEN 'mid'
      |            ELSE 'high' END AS qty_bucket,
      |  count(*) AS n, sum(l_extendedprice) AS total
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .withColumn("qty_bucket",
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high"))
      .groupBy("qty_bucket")
      .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("total"))
      .orderBy("qty_bucket")
  }

  // Isin (reference _expr.py:1364) + Between (:1401).
  q("q_isin_between",
    """SELECT l_returnflag, count(*) AS n
      |FROM lineitem
      |WHERE l_returnflag IN ('R', 'A')
      |  AND l_quantity BETWEEN 10 AND 20
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("R", "A") &&
        col("l_quantity").between(10, 20))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  // Null ops: IsNa/NotNull/Fillna/DropNa/Replace (reference _expr.py:1534,
  // 1619, 1349, 1108, 1356). The test tables have no NULLs, so nulls are
  // synthesized identically on both sides with nullif().
  q("q_null_ops",
    """WITH t AS (
      |  SELECT event_id, nullif(value, 0.0) AS v,
      |         nullif(event_type, 'error') AS et
      |  FROM events)
      |SELECT count(*) AS n_rows,
      |  count(v) AS n_notnull,
      |  count(*) - count(v) AS n_null,
      |  sum(coalesce(v, -1.0)) AS filled_sum,
      |  count(et) AS et_notnull
      |FROM t""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(
        nullif(col("value"), lit(0.0)).as("v"),
        nullif(col("event_type"), lit("error")).as("et"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("v")).as("n_notnull"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        sum(coalesce(col("v"), lit(-1.0))).as("filled_sum"),
        count(col("et")).as("et_notnull"))
  }

  // DropnaFrame (reference _expr.py:1108): df.na.drop over synthesized nulls.
  q("q_dropna",
    """SELECT event_id, value FROM (
      |  SELECT event_id, nullif(value, 0.0) AS value FROM events)
      |WHERE value IS NOT NULL
      |ORDER BY event_id LIMIT 2000""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"), nullif(col("value"), lit(0.0)).as("value"))
      .na.drop("any", Seq("value"))
      .orderBy("event_id").limit(2000)
  }

  // Clip (reference _expr.py:1381) + Where/Mask (:1553,1540).
  q("q_clip_where_mask",
    """SELECT l_orderkey, l_linenumber,
      |  least(greatest(l_quantity, 5.0), 45.0) AS qty_clipped,
      |  CASE WHEN l_discount > 0.05 THEN l_discount ELSE 0.0 END AS big_disc,
      |  CASE WHEN l_tax > 0.04 THEN NULL ELSE l_tax END AS masked_tax
      |FROM lineitem WHERE l_orderkey < 1500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).filter(col("l_orderkey") < 1500)
      .select(col("l_orderkey"), col("l_linenumber"),
        least(greatest(col("l_quantity"), lit(5.0)), lit(45.0)).as("qty_clipped"),
        when(col("l_discount") > 0.05, col("l_discount")).otherwise(lit(0.0)).as("big_disc"),
        when(col("l_tax") > 0.04, lit(null)).otherwise(col("l_tax")).as("masked_tax"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // AsType casts (reference _expr.py:1485). DuckDB CAST(double AS INT)
  // rounds while Spark truncates, so the double→int path goes through
  // floor() on both sides.
  q("q_astype_cast",
    """SELECT l_orderkey,
      |  CAST(floor(l_quantity) AS INTEGER) AS qty_int,
      |  CAST(l_linenumber AS DOUBLE) AS line_dbl,
      |  CAST(l_orderkey AS VARCHAR) AS okey_str,
      |  CAST(l_shipdate AS DATE) AS ship_day
      |FROM lineitem WHERE l_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).filter(col("l_orderkey") < 1000)
      .orderBy("l_orderkey", "l_linenumber")
      .select(col("l_orderkey"),
        floor(col("l_quantity")).cast("int").as("qty_int"),
        col("l_linenumber").cast("double").as("line_dbl"),
        col("l_orderkey").cast("string").as("okey_str"),
        col("l_shipdate").cast("date").as("ship_day"))
  }

  // Scalar math: Abs/Sqrt/Round + ufuncs (reference _expr.py:1547,1598,1804;
  // ufunc surface _collection.py:6383).
  q("q_scalar_math",
    """SELECT event_id,
      |  abs(value - 10.0) AS abs_dev,
      |  sqrt(value) AS sqrt_v,
      |  exp(value / 100.0) AS exp_v,
      |  ln(value + 1.0) AS log_v,
      |  floor(value) AS floor_v,
      |  ceil(value) AS ceil_v,
      |  sign(value - 10.0) AS sign_v
      |FROM events WHERE user_id < 10
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).filter(col("user_id") < 10)
      .select(col("event_id"),
        abs(col("value") - 10.0).as("abs_dev"),
        sqrt(col("value")).as("sqrt_v"),
        exp(col("value") / 100.0).as("exp_v"),
        log(col("value") + 1.0).as("log_v"),
        floor(col("value")).as("floor_v"),
        ceil(col("value")).as("ceil_v"),
        signum(col("value") - 10.0).as("sign_v"))
      .orderBy("event_id")
  }

  // Rename / Drop (reference _expr.py:1239 RenameFrame, :1822 Drop).
  q("q_rename_drop",
    """SELECT o_orderkey AS order_id, o_totalprice AS total, o_orderstatus AS status
      |FROM orders WHERE o_orderkey < 3000
      |ORDER BY order_id""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).filter(col("o_orderkey") < 3000)
      .withColumnRenamed("o_orderkey", "order_id")
      .withColumnRenamed("o_totalprice", "total")
      .withColumnRenamed("o_orderstatus", "status")
      .drop("o_custkey", "o_orderdate", "o_orderpriority")
      .orderBy("order_id")
  }

  // ExplodeSeries (reference _expr.py:1809): split text, explode, count.
  q("q_explode_words",
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word ORDER BY cnt DESC, word LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(100)
  }

  // ---------------------------------------------------------------
  // §2.9 String accessor surface
  // ---------------------------------------------------------------

  q("q_str_basic",
    """SELECT p_partkey,
      |  upper(p_name) AS up,
      |  lower(p_brand) AS lo,
      |  length(p_name) AS len,
      |  substr(p_name, 1, 8) AS pre,
      |  lpad(p_brand, 12, '_') AS padded,
      |  trim(lpad(p_brand, 12, ' ')) AS trimmed,
      |  contains(p_name, 'a') AS has_a,
      |  starts_with(p_type, 'STANDARD') AS std,
      |  p_name || '/' || p_brand AS joined,
      |  replace(p_type, ' ', '-') AS dashed,
      |  reverse(p_brand) AS rev,
      |  repeat(p_brand, 2) AS rep
      |FROM part WHERE p_partkey < 2000
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).filter(col("p_partkey") < 2000)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 8).as("pre"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        trim(lpad(col("p_brand"), 12, " ")).as("trimmed"),
        col("p_name").contains("a").as("has_a"),
        col("p_type").startsWith("STANDARD").as("std"),
        concat(col("p_name"), lit("/"), col("p_brand")).as("joined"),
        regexp_replace(col("p_type"), " ", "-").as("dashed"),
        reverse(col("p_brand")).as("rev"),
        repeat(col("p_brand"), 2).as("rep"))
      .orderBy("p_partkey")
  }

  // Regex family: extract / replace / match (reference _str_accessor.py).
  q("q_str_regex",
    """SELECT p_partkey,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
      |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
      |  regexp_matches(p_type, '^STANDARD|^SMALL') AS is_std_small
      |FROM part WHERE p_partkey < 2000
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).filter(col("p_partkey") < 2000)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
        col("p_type").rlike("^STANDARD|^SMALL").as("is_std_small"))
      .orderBy("p_partkey")
  }

  // split + element access (reference str.split / SplitMap).
  q("q_str_split",
    """SELECT p_partkey,
      |  split_part(p_type, ' ', 1) AS type_head,
      |  split_part(p_type, ' ', -1) AS type_tail,
      |  len(string_split(p_name, ' ')) AS n_words
      |FROM part WHERE p_partkey < 2000
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).filter(col("p_partkey") < 2000)
      .select(col("p_partkey"),
        element_at(split(col("p_type"), " "), 1).as("type_head"),
        element_at(split(col("p_type"), " "), -1).as("type_tail"),
        size(split(col("p_name"), " ")).as("n_words"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------
  // §2.9 Datetime accessor surface
  // ---------------------------------------------------------------

  q("q_dt_parts",
    """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  count(*) AS n,
      |  min(dayofmonth(o_orderdate)) AS min_day,
      |  max(quarter(o_orderdate)) AS max_q,
      |  min(dayofyear(o_orderdate)) AS min_doy,
      |  max(isodow(o_orderdate)) AS max_wd
      |FROM orders
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"),
        min(dayofmonth(col("o_orderdate"))).as("min_day"),
        max(quarter(col("o_orderdate"))).as("max_q"),
        min(dayofyear(col("o_orderdate"))).as("min_doy"),
        max(weekday(col("o_orderdate")) + 1).as("max_wd"))
      .orderBy("y", "m")
  }

  q("q_dt_trunc_format",
    """SELECT date_trunc('month', o_orderdate) AS month_start,
      |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_day,
      |  count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month_start"))
      .agg(date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"),
        count(lit(1)).as("n"))
      .orderBy("month_start")
  }

  q("q_dt_arith",
    """SELECT o_orderkey,
      |  o_orderdate + INTERVAL 3 DAY AS plus3,
      |  date_diff('day', o_orderdate, TIMESTAMP '1996-01-01') AS days_to_96,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(dayofmonth(o_orderdate) = 1 AS BOOLEAN) AS is_month_start
      |FROM orders WHERE o_orderkey < 2000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("plus3"),
        datediff(lit("1996-01-01").cast("timestamp"), col("o_orderdate")).as("days_to_96"),
        last_day(col("o_orderdate")).as("month_end"),
        (dayofmonth(col("o_orderdate")) === 1).as("is_month_start"))
      .orderBy("o_orderkey")
  }
}
