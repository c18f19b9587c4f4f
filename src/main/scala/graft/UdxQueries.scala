package graft

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-extension (UDx) surface: the reference's map_partitions /
  * apply / custom Aggregation / grouped apply story
  * (`_collection.py:985-1122,3172,4199,2120-2262`,
  * `_groupby.py:95-155,872-1065`), expressed as Spark's typed Dataset
  * API + Aggregator UDAFs. Each query computes something an oracle can
  * verify in SQL, proving the imperative path produces the same values
  * as the declarative one.
  */
object UdxQueries {

  def registerAll(reg: (String, Option[String], (SparkSession, String) => DataFrame) => Unit): Unit = {

    def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Unit =
      reg(name, Some(oracle), fn)

    // map_partitions: partition-at-a-time imperative transform
    // (reference _expr.py:580, _collection.py:985). One task per input
    // partition, no shuffle; the partition iterator never materializes.
    q("q_map_partitions",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS disc_price
        |FROM lineitem WHERE l_orderkey < 1500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val in = Tables.lineitem(s, dir).filter(col("l_orderkey") < 1500)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      val outSchema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("disc_price", DoubleType)))
      implicit val enc = Encoders.row(outSchema)
      in.mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), r.getInt(1), r.getDouble(2) * (1 - r.getDouble(3)))
        }
      }.orderBy("l_orderkey", "l_linenumber")
    }

    // Row-wise apply/map (reference _expr.py:1721, _collection.py:3172).
    q("q_row_apply",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket,
        |  length(o_orderpriority) AS prio_len
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val in = Tables.orders(s, dir).filter(col("o_orderkey") < 2000)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
      val outSchema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("bucket", StringType),
        StructField("prio_len", IntegerType)))
      implicit val enc = Encoders.row(outSchema)
      in.map { r =>
        val bucket = if (r.getDouble(1) > 200000) "big" else "small"
        Row(r.getLong(0), bucket, r.getString(2).length)
      }.orderBy("o_orderkey")
    }

    // Custom Aggregator in groupBy (reference custom Aggregation,
    // _groupby.py:95-155): geometric mean of quantity per return flag.
    q("q_custom_agg_geomean",
      """SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 9) AS geo_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(round(functions.Udafs.geoMean(col("l_quantity")), 9).as("geo_qty"))
        .orderBy("l_returnflag")
    }

    // Grouped apply (reference GroupByApply, _groupby.py:872): per-group
    // z-score computed imperatively in flatMapGroups. Values are summed
    // in event_id order inside the group so the result is deterministic;
    // rounding to 6 absorbs the (order-differing) oracle's float noise.
    q("q_grouped_apply_zscore",
      s"""SELECT event_id, round((value - avg(value) OVER w) /
         |    (CASE WHEN stddev_pop(value) OVER w = 0 THEN 1.0
         |          ELSE stddev_pop(value) OVER w END), 6) AS z
         |FROM ${Queries.EVENTS_SQL}
         |WHERE user_id < 10
         |WINDOW w AS (PARTITION BY user_id)
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val in = Tables.events(s, dir).filter(col("user_id") < 10)
        .select("user_id", "event_id", "value")
      val outSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("z", DoubleType)))
      implicit val rowEnc = Encoders.row(outSchema)
      in.groupByKey(_.getLong(0))(Encoders.scalaLong)
        .flatMapGroups { (_, it) =>
          val rows = it.toArray.sortBy(_.getLong(1))
          val vs = rows.map(_.getDouble(2))
          val mean = vs.sum / vs.length
          val varp = vs.map(v => (v - mean) * (v - mean)).sum / vs.length
          val std = math.sqrt(varp)
          val denom = if (std == 0) 1.0 else std
          rows.iterator.map { r =>
            val z = (r.getDouble(2) - mean) / denom
            Row(r.getLong(1), math.rint(z * 1e6) / 1e6)
          }
        }.orderBy("event_id")
    }

    // Generic reduction() surface (reference _collection.py:2120): a
    // chunk/aggregate pair — here sum-of-squares via mapPartitions
    // partials + a final agg, the distributed-reduction recipe.
    q("q_custom_reduction",
      """SELECT sum(l_quantity * l_quantity) AS sumsq, count(*) AS n
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val in = Tables.lineitem(s, dir).select("l_quantity")
      val partial = StructType(Seq(
        StructField("ss", DoubleType), StructField("n", LongType)))
      implicit val enc = Encoders.row(partial)
      in.mapPartitions { it =>
        var ss = 0.0; var n = 0L
        it.foreach { r => val v = r.getDouble(0); ss += v * v; n += 1 }
        Iterator(Row(ss, n))
      }.agg(sum("ss").as("sumsq"), sum("n").as("n"))
    }
  }
}
