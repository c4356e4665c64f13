package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Support._

/** Window-function and sort/limit/set-operation contract queries
  * (SURVEY.md §2.5–§2.6). Window ranks are cast to BIGINT on both engines
  * (Spark emits INT, DuckDB BIGINT).
  */
object Windows {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val defs: Seq[Q] = Seq(

    dfQ("q31_ranking",
      """SELECT o_custkey, o_orderkey,
        |       CAST(ROW_NUMBER() OVER w AS BIGINT) rn, CAST(RANK() OVER w AS BIGINT) rk,
        |       CAST(DENSE_RANK() OVER w AS BIGINT) drk
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders").filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"))
        .orderBy("o_custkey", "rn")
    },

    dfQ("q32_lag_lead",
      """SELECT user_id, event_id,
        |       LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_t,
        |       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) next_t
        |FROM events WHERE user_id < 25 ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events").filter(col("user_id") < 25)
        .withColumn("prev_t", lag("event_type", 1).over(w))
        .withColumn("next_t", lead("event_type", 1).over(w))
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "event_id", "prev_t", "next_t")
    },

    dfQ("q33_running_sum",
      """SELECT user_id, event_id, ROUND(SUM(value) OVER
        |       (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) run_sum
        |FROM events WHERE user_id < 25 ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events").filter(col("user_id") < 25)
        .withColumn("run_sum", round(sum("value").over(w), 2))
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "event_id", "run_sum")
    },

    dfQ("q34_moving_avg",
      """SELECT user_id, event_id, ROUND(AVG(value) OVER
        |       (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),4) mavg
        |FROM events WHERE user_id < 25 ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
      t(s, d, "events").filter(col("user_id") < 25)
        .withColumn("mavg", round(avg("value").over(w), 4))
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "event_id", "mavg")
    },

    sameQ("q35_ntile_dist",
      """SELECT o_orderkey, CAST(NTILE(4) OVER w AS BIGINT) q, ROUND(PERCENT_RANK() OVER w,6) pr,
        |       ROUND(CUME_DIST() OVER w,6) cd
        |FROM orders WHERE o_custkey < 15
        |WINDOW w AS (ORDER BY o_totalprice, o_orderkey) ORDER BY o_totalprice, o_orderkey""".stripMargin),

    dfQ("q36_first_last",
      """SELECT o_custkey, o_orderkey,
        |       FIRST_VALUE(o_orderkey) OVER w f, LAST_VALUE(o_orderkey) OVER w l
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders").filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          first("o_orderkey").over(w).as("f"),
          last("o_orderkey").over(w).as("l"))
        .orderBy("o_custkey", "o_orderkey")
    },

    dfQ("q37_range_frame",
      """SELECT o_orderkey, ROUND(o_totalprice,2) p,
        |       COUNT(*) OVER (ORDER BY o_totalprice RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) near_cnt
        |FROM orders WHERE o_custkey < 15 ORDER BY o_totalprice, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.orderBy("o_totalprice").rangeBetween(-1000, Window.currentRow)
      t(s, d, "orders").filter(col("o_custkey") < 15)
        .withColumn("near_cnt", count(lit(1)).over(w))
        .orderBy("o_totalprice", "o_orderkey")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("p"),
          col("near_cnt"))
    },

    dfQ("q38_topk_per_group",
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, ROUND(c_acctbal,2) bal,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) rn
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("bal"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    },

    sameQ("q39_sort_limit_offset",
      """SELECT o_orderkey FROM orders
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 10""".stripMargin),

    dfQ("q40_global_topk",
      """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice,2) p FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin) { (s, d) =>
      // orderBy().limit() plans as TakeOrderedAndProject: per-partition top-k,
      // single driver merge — no global sort even at 100 TB.
      t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("p"))
    },

    sameQ("q41_union",
      """SELECT 'all' kind, COUNT(*) n FROM (SELECT o_custkey k FROM orders UNION ALL SELECT c_custkey FROM customer) t
        |UNION ALL
        |SELECT 'dist', COUNT(*) FROM (SELECT o_custkey k FROM orders UNION SELECT c_custkey FROM customer) t
        |ORDER BY kind""".stripMargin),

    dfQ("q41b_distinct_count",
      "SELECT COUNT(*) n FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) t") { (s, d) =>
      t(s, d, "lineitem").select("l_orderkey", "l_partkey")
        .distinct().agg(count(lit(1)).as("n"))
    },

    dfQ("q42_intersect",
      """SELECT k FROM (SELECT DISTINCT o_custkey k FROM orders) a
        |INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000 ORDER BY k""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(col("o_custkey").as("k")).distinct()
        .intersect(t(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("k")))
        .orderBy("k")
    },

    dfQ("q42b_intersect_all",
      """SELECT l_partkey k FROM lineitem WHERE l_orderkey < 100
        |INTERSECT ALL SELECT l_partkey FROM lineitem WHERE l_partkey < 500 ORDER BY k""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_partkey").as("k"))
        .intersectAll(t(s, d, "lineitem").filter(col("l_partkey") < 500)
          .select(col("l_partkey").as("k")))
        .orderBy("k")
    },

    dfQ("q43_except",
      """SELECT c_custkey k FROM customer
        |EXCEPT SELECT DISTINCT o_custkey FROM orders ORDER BY k""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    dfQ("q43b_except_all",
      """SELECT l_partkey k FROM lineitem WHERE l_orderkey < 200
        |EXCEPT ALL SELECT l_partkey FROM lineitem WHERE l_orderkey >= 200 AND l_orderkey < 400
        |ORDER BY k""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 200)
        .select(col("l_partkey").as("k"))
        .exceptAll(t(s, d, "lineitem")
          .filter(col("l_orderkey") >= 200 && col("l_orderkey") < 400)
          .select(col("l_partkey").as("k")))
        .orderBy("k")
    }
  )
}
