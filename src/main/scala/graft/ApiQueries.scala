package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Frame, Series}

/** Oracle-gated queries expressed THROUGH the user-facing `graft.api`
  * facade — the correctness gate for the engine's public surface
  * (reference `_collection.py` DataFrame/Series methods). Everything
  * here composes Frame/Series calls only; the DuckDB oracle replays the
  * same semantics in SQL.
  */
object ApiQueries {

  def registerAll(reg: (String, Option[String], (SparkSession, String) => DataFrame) => Unit): Unit = {

    def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Unit =
      reg(name, Some(oracle), fn)

    // End-to-end facade pipeline: merge → filter → groupby dict-agg →
    // sort. The one query a reference user would write first.
    q("q_api_pipeline",
      """SELECT c_mktsegment,
        |  sum(o_totalprice) AS o_totalprice_sum,
        |  avg(o_totalprice) AS o_totalprice_mean,
        |  count(o_orderkey) AS o_orderkey_count
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_totalprice > 100000
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val c = Frame(Tables.customer(s, dir)).rename("c_custkey" -> "o_custkey")
      val o = Frame(Tables.orders(s, dir))
      c.merge(o, on = Seq("o_custkey"))
        .query("o_totalprice > 100000")
        .groupby("c_mktsegment")
        .agg("o_totalprice" -> "sum", "o_totalprice" -> "mean", "o_orderkey" -> "count")
        .sortValues("c_mktsegment").toDF
    }

    // str accessor tail (reference _str_accessor.py: findall, count,
    // removeprefix/removesuffix, partition, zfill, wrap, find).
    q("q_str_tail2",
      """SELECT p_partkey,
        |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
        |  len(regexp_extract_all(p_name, 'e')) AS n_e,
        |  CASE WHEN starts_with(p_name, 'red ') THEN substr(p_name, 5) ELSE p_name END AS unred,
        |  CASE WHEN suffix(p_name, ' bolt') THEN substr(p_name, 1, length(p_name) - 5) ELSE p_name END AS unbolt,
        |  CASE WHEN instr(p_name, ' ') > 0 THEN split_part(p_name, ' ', 1) ELSE p_name END AS part_head,
        |  CASE WHEN instr(p_name, ' ') > 0 THEN substr(p_name, instr(p_name, ' ') + 1) ELSE '' END AS part_tail,
        |  lpad(p_brand, 12, '0') AS z,
        |  array_to_string(regexp_extract_all(p_name, '.{1,6}'), chr(10)) AS wrapped,
        |  instr(p_name, 'dg') - 1 AS found
        |FROM part WHERE p_partkey < 1000
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val p = Frame(Tables.part(s, dir))
      p.filter(p("p_partkey") < 1000)
        .assign(
          "words" -> Series(array_join(p("p_name").str.findall("[a-z]+").col, ",")),
          "n_e" -> p("p_name").str.count("e"),
          "unred" -> p("p_name").str.removeprefix("red "),
          "unbolt" -> p("p_name").str.removesuffix(" bolt"),
          "pt" -> p("p_name").str.partition(" "),
          "z" -> p("p_brand").str.zfill(12),
          "wrapped" -> p("p_name").str.wrap(6),
          "found" -> p("p_name").str.find("dg"))
        .assign("part_head" -> Series(col("pt.head")), "part_tail" -> Series(col("pt.tail")))
        .select("p_partkey", "words", "n_e", "unred", "unbolt",
          "part_head", "part_tail", "z", "wrapped", "found")
        .sortValues("p_partkey").toDF
    }

    // str.normalize (reference _str_accessor.py normalize) — native
    // codegen'd NFC over a decomposed input (combining acute, U+0301),
    // plus casefold (upper∘lower handles one-to-many folds like ß→ss).
    // length() counts code points on both engines, so pre/post lengths
    // prove composition actually happened.
    q("q_str_normalize",
      """SELECT p_partkey,
        |  nfc_normalize('Cafe' || chr(769) || ' ' || substr(p_name, 1, 10)) AS nfc,
        |  length('Cafe' || chr(769) || ' ' || substr(p_name, 1, 10)) AS len_raw,
        |  length(nfc_normalize('Cafe' || chr(769) || ' ' || substr(p_name, 1, 10))) AS len_nfc,
        |  lower(upper('STRASSE-' || p_brand)) AS folded
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val p = Frame(Tables.part(s, dir))
      val raw = Series(concat(lit("Cafe\u0301 "), substring(col("p_name"), 1, 10)))
      p.filter(p("p_partkey") < 500)
        .assign(
          "nfc" -> raw.str.normalize("NFC"),
          "len_raw" -> raw.str.len,
          "len_nfc" -> raw.str.normalize("NFC").str.len,
          "folded" -> Series(concat(lit("STRASSE-"), col("p_brand"))).str.casefold)
        .select("p_partkey", "nfc", "len_raw", "len_nfc", "folded")
        .sortValues("p_partkey").toDF
    }

    // dt accessor tail (reference _datetime.py: tz_localize/tz_convert
    // via fixed offsets — session-TZ-independent on both engines —
    // to_period, total_seconds).
    q("q_dt_tz",
      s"""SELECT event_id,
         |  ts + INTERVAL 5 HOUR + INTERVAL 30 MINUTE AS ist_wall,
         |  ts + INTERVAL 8 HOUR AS from_pst_utc,
         |  date_trunc('quarter', ts) AS period_q,
         |  epoch_us(ts) / 1000000.0 AS epoch_s,
         |  (epoch_us(ts) - epoch_us(date_trunc('day', ts))) / 1000000.0 AS secs_into_day
         |FROM ${Queries.EVENTS_SQL}
         |WHERE user_id < 5
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Frame(Tables.events(s, dir))
      ev.filter(ev("user_id") < 5)
        .assign(
          "ist_wall" -> ev("ts").dt.tzConvert("GMT+05:30"),
          "from_pst_utc" -> ev("ts").dt.tzLocalize("GMT-08:00"),
          "period_q" -> ev("ts").dt.toPeriod("quarter"),
          "epoch_s" -> ev("ts").dt.epochSeconds,
          "secs_into_day" -> ev("ts").dt.secondsIntoDay)
        .select("event_id", "ist_wall", "from_pst_utc", "period_q", "epoch_s", "secs_into_day")
        .sortValues("event_id").toDF
    }

    // loc / divisions slicing (reference LocIndexer _indexing.py:38):
    // index the frame, slice a key range — the filter reaches the scan
    // (asserted in FrameApiSpec) and prunes range partitions.
    q("q_loc_range",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Frame(Tables.orders(s, dir))
        .setIndex("o_orderkey")
        .locRange(1000L, 2000L)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .sortValues("o_orderkey").toDF
    }

    // Dynamic get_dummies (reference _dummies.py:1, _categorical.py:157
    // GetCategories): categories DISCOVERED from the data at plan-build
    // time (bounded distinct), then a static 0/1 projection.
    q("q_get_dummies_dynamic",
      """SELECT o_orderkey,
        |  CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS pri_1_URGENT,
        |  CAST(o_orderpriority = '2-HIGH' AS INTEGER) AS pri_2_HIGH,
        |  CAST(o_orderpriority = '3-MEDIUM' AS INTEGER) AS pri_3_MEDIUM,
        |  CAST(o_orderpriority = '4-NOT SPECIFIED' AS INTEGER) AS pri_4_NOT_SPECIFIED,
        |  CAST(o_orderpriority = '5-LOW' AS INTEGER) AS pri_5_LOW
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = Frame(Tables.orders(s, dir))
      o.filter(o("o_orderkey") < 1000)
        .getDummies("o_orderpriority", prefix = "pri_")
        .select("o_orderkey", "pri_1_URGENT", "pri_2_HIGH", "pri_3_MEDIUM",
          "pri_4_NOT_SPECIFIED", "pri_5_LOW")
        .sortValues("o_orderkey").toDF
    }

    // FromArray (reference io/io.py:600 FromArray): an ArrayType column
    // unpacked into scalar frame columns — the ndarray → frame path.
    q("q_from_array",
      """SELECT vec_id,
        |  embedding[1] AS e0, embedding[2] AS e1, embedding[3] AS e2,
        |  len(embedding) AS dim, label
        |FROM embeddings WHERE vec_id < 100
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val e = Frame(Tables.embeddings(s, dir))
      e.filter(e("vec_id") < 100)
        .assign(
          "e0" -> Series(element_at(col("embedding"), 1)),
          "e1" -> Series(element_at(col("embedding"), 2)),
          "e2" -> Series(element_at(col("embedding"), 3)),
          "dim" -> Series(size(col("embedding"))))
        .select("vec_id", "e0", "e1", "e2", "dim", "label")
        .sortValues("vec_id").toDF
    }

    // JoinRecursive: n-frame fold join on one shared key (reference
    // _merge.py:939-988). Three nation-keyed aggregates folded together.
    q("q_join_multi_frame",
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust,
        |           sum(c_acctbal) AS cust_bal FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT n_nationkey AS nk, n_name, n_cust, cust_bal, n_supp
        |FROM nation JOIN c ON n_nationkey = c.nk JOIN s ON n_nationkey = s.nk
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      val n = Frame(Tables.nation(s, dir))
        .rename("n_nationkey" -> "nk").select("nk", "n_name")
      val c = Frame(Tables.customer(s, dir)).rename("c_nationkey" -> "nk")
        .groupby("nk").aggNamed(("n_cust", "size", "nk"), ("cust_bal", "sum", "c_acctbal"))
      val sup = Frame(Tables.supplier(s, dir)).rename("s_nationkey" -> "nk")
        .groupby("nk").aggNamed(("n_supp", "size", "nk"))
      n.mergeMulti(Seq(c, sup), on = Seq("nk"))
        .sortValues("nk").toDF
    }

    // describe() composed across numeric AND non-numeric columns
    // (reference _describe.py:16-103): numeric stats for o_totalprice,
    // count/nunique/top/freq for o_orderpriority — `top` pinned to the
    // lexicographically-smallest most-frequent value on both engines.
    q("q_describe_full",
      """WITH vc AS (SELECT o_orderpriority AS v, count(*) AS c
        |            FROM orders GROUP BY 1),
        |top AS (SELECT v, c FROM vc ORDER BY c DESC, v LIMIT 1)
        |SELECT count(o_totalprice) AS price_count,
        |  avg(o_totalprice) AS price_mean,
        |  stddev_samp(o_totalprice) AS price_std,
        |  min(o_totalprice) AS price_min,
        |  quantile_cont(o_totalprice, 0.5) AS price_p50,
        |  max(o_totalprice) AS price_max,
        |  count(o_orderpriority) AS pri_count,
        |  count(DISTINCT o_orderpriority) AS pri_unique,
        |  any_value(top.v) AS pri_top,
        |  any_value(top.c) AS pri_freq
        |FROM orders, top""".stripMargin) { (s, dir) =>
      val o = Frame(Tables.orders(s, dir))
      val med = o.median("o_totalprice")
      val top = o.valueCounts("o_orderpriority")
        .sortValuesBy("cnt" -> false, "value" -> true).head(1)
        .rename("value" -> "pri_top", "cnt" -> "pri_freq")
      o.groupby().aggExpr(
          "price_count" -> Series(count(col("o_totalprice"))),
          "price_mean" -> Series(avg("o_totalprice")),
          "price_std" -> Series(stddev_samp(col("o_totalprice"))),
          "price_min" -> Series(min("o_totalprice")),
          "price_p50" -> Series(lit(med)),
          "price_max" -> Series(max("o_totalprice")),
          "pri_count" -> Series(count(col("o_orderpriority"))),
          "pri_unique" -> Series(countDistinct(col("o_orderpriority"))))
        .transform(_.crossJoin(broadcast(top.toDF))).toDF
    }
  }
}
