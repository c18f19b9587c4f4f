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
}
