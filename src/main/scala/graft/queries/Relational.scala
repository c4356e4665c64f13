package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Support._

/** Scan / filter / join / aggregation contract queries (SURVEY.md §2.1–§2.4).
  *
  * Implemented with the DataFrame API wherever the operator is the point
  * (joins, aggregates) so Catalyst sees a declarative plan it can push down,
  * prune, reorder and broadcast; SQL where the surface under test is SQL
  * itself (subqueries, grouping sets). Every query ends in a total order with
  * a unique tiebreak, doubles are ROUNDed in-query, and computed integers are
  * cast to BIGINT on both engines (DuckDB widens int aggregates to HUGEINT
  * and date parts to BIGINT, which would otherwise be a schema mismatch).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val defs: Seq[Q] = Seq(

    dfQ("q01_count", "SELECT COUNT(*) AS n FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))
    },

    dfQ("q02_project_limit",
      // sorts by ALL output columns: (l_orderkey, l_linenumber) is not
      // unique at sf0.1 (verified), so remaining ties must be identical rows
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity").limit(100)
    },

    dfQ("q03_filter_conj",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_returnflag = 'R' AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },

    dfQ("q04_in_like",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3') AND p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_name").like("%a%"))
        .select("p_partkey", "p_name").orderBy("p_partkey")
    },

    sameQ("q05_null_logic",
      """SELECT COUNT(*) AS total,
        |       COUNT(NULLIF(o_orderstatus,'P')) AS non_p,
        |       CAST(SUM(CASE WHEN NULLIF(o_orderstatus,'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_as_null
        |FROM orders""".stripMargin),

    dfQ("q06_date_range",
      """SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice),2) AS rev FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate").cast("date") < lit("1997-01-01").cast("date"))
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
    },

    dfQ("q10_join_agg",
      """SELECT c.c_mktsegment, COUNT(*) AS n, ROUND(SUM(o.o_totalprice),2) AS rev
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (s, d) =>
      // dim side is small at every SF tier relative to orders: broadcast it so
      // the fact table never shuffles for the join (only for the group-by).
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
        .orderBy("c_mktsegment")
    },

    dfQ("q11_star_join",
      """SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS odate,
        |       ROUND(SUM(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey
        |JOIN lineitem l ON l.l_orderkey=o.o_orderkey
        |WHERE c.c_mktsegment='BUILDING' AND o.o_orderstatus='O'
        |GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
        |ORDER BY revenue DESC, o.o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      // TPC-H Q3 shape: filters reach the scans (pushdown), selective dims
      // broadcast, the lineitem fact is the only big input.
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "O")
      val l = t(s, d, "lineitem")
      l.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("odate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(20)
    },

    dfQ("q12_left_join",
      """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON o.o_custkey=c.c_custkey
        |GROUP BY c.c_custkey ORDER BY n_orders DESC, c.c_custkey LIMIT 50""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("n_orders").desc, col("c_custkey")).limit(50)
    },

    dfQ("q13_right_join",
      """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        |FROM orders o RIGHT JOIN customer c ON o.o_custkey=c.c_custkey
        |GROUP BY c.c_custkey ORDER BY n_orders DESC, c.c_custkey LIMIT 50""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("n_orders").desc, col("c_custkey")).limit(50)
    },

    dfQ("q14_full_join",
      """SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb FROM
        | (SELECT l_partkey AS k, COUNT(*) AS na FROM lineitem WHERE l_partkey < 120 GROUP BY l_partkey) a
        | FULL JOIN
        | (SELECT p_partkey AS k, COUNT(*) AS nb FROM part WHERE p_partkey >= 80 GROUP BY p_partkey) b
        | ON a.k=b.k
        |ORDER BY k""".stripMargin) { (s, d) =>
      val a = t(s, d, "lineitem").filter(col("l_partkey") < 120)
        .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("na"))
      val b = t(s, d, "part").filter(col("p_partkey") >= 80)
        .groupBy(col("p_partkey").as("k")).agg(count(lit(1)).as("nb"))
      a.join(b, Seq("k"), "full").orderBy("k") // using-column full join coalesces k
    },

    dfQ("q15_semi_join",
      """SELECT s.s_suppkey, s.s_name FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
      t(s, d, "supplier")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 45),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name").orderBy("s_suppkey")
    },

    dfQ("q16_anti_join",
      """SELECT c.c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },

    dfQ("q17_cross_join",
      """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_name", "n_name").orderBy("r_name", "n_name")
    },

    dfQ("q18_range_join",
      """SELECT e1.event_id AS a, COUNT(*) AS follows_1h
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
        |WHERE e1.user_id < 50
        |GROUP BY e1.event_id ORDER BY e1.event_id""".stripMargin) { (s, d) =>
      // Equi-key on user_id keeps this a hash/SMJ join with a band residual —
      // NOT a nested-loop cross product. At 100 TB the same shape holds:
      // shuffle by user_id, band predicate evaluated within the match group.
      val e1 = t(s, d, "events").filter(col("user_id") < 50).alias("e1")
      val e2 = t(s, d, "events").alias("e2")
      e1.join(e2,
        col("e1.user_id") === col("e2.user_id") &&
          col("e2.ts") > col("e1.ts") &&
          col("e2.ts") <= col("e1.ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("e1.event_id").as("a"))
        .agg(count(lit(1)).as("follows_1h"))
        .orderBy("a")
    },

    dfQ("q19_asof_window",
      """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |       strftime(MAX(CASE WHEN event_type='purchase' THEN ts END)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         '%Y-%m-%d %H:%M:%S') AS last_purchase
        |FROM events WHERE user_id < 20
        |ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events").filter(col("user_id") < 20)
        .withColumn("lp",
          max(when(col("event_type") === "purchase", col("ts"))).over(w))
        .orderBy("user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          date_format(col("lp"), "yyyy-MM-dd HH:mm:ss").as("last_purchase"))
    },

    dfQ("q20_global_agg",
      """SELECT COUNT(*) n, ROUND(SUM(l_extendedprice),2) s, ROUND(AVG(l_quantity),4) a,
        |       ROUND(MIN(l_discount),4) mn, ROUND(MAX(l_tax),4) mx FROM lineitem""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("s"),
        round(avg("l_quantity"), 4).as("a"),
        round(min("l_discount"), 4).as("mn"),
        round(max("l_tax"), 4).as("mx"))
    },

    dfQ("q21_pricing_summary",
      """SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity),2) sum_qty,
        |       ROUND(SUM(l_extendedprice),2) sum_base,
        |       ROUND(SUM(l_extendedprice*(1-l_discount)),2) sum_disc,
        |       ROUND(SUM(l_extendedprice*(1-l_discount)*(1+l_tax)),2) sum_charge,
        |       ROUND(AVG(l_quantity),4) avg_qty, ROUND(AVG(l_extendedprice),4) avg_price,
        |       ROUND(AVG(l_discount),4) avg_disc, COUNT(*) n
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(disc), 2).as("sum_disc"),
          round(sum(disc * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    dfQ("q22_count_distinct",
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) dp, COUNT(DISTINCT l_suppkey) ds,
        |       COUNT(*) n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("dp"),
          countDistinct(col("l_suppkey")).as("ds"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    dfQ("q23_having",
      """SELECT o_custkey, COUNT(*) n FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 12 ORDER BY n DESC, o_custkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 12).orderBy(col("n").desc, col("o_custkey"))
    },

    sameQ("q23b_scalar_subquery",
      """SELECT o_orderkey, ROUND(o_totalprice,2) p FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice)*2 FROM orders)
        |ORDER BY o_orderkey""".stripMargin),

    sameQ("q24_rollup",
      """SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) y, o_orderstatus st,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) g, COUNT(*) n, ROUND(SUM(o_totalprice),2) rev
        |FROM orders GROUP BY ROLLUP (YEAR(CAST(o_orderdate AS DATE)), o_orderstatus)
        |ORDER BY y ASC NULLS FIRST, st ASC NULLS FIRST, g""".stripMargin),

    dfQ("q25_cube",
      """SELECT l_returnflag f, l_linestatus s, COUNT(*) n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY f ASC NULLS FIRST, s ASC NULLS FIRST""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag").as("f"), col("l_linestatus").as("s"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("f"), asc_nulls_first("s"))
    },

    sameQ("q26_grouping_sets",
      """SELECT l_returnflag f, l_linestatus s, COUNT(*) n FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY f ASC NULLS FIRST, s ASC NULLS FIRST""".stripMargin),

    sameQ("q27_filtered_agg",
      """SELECT COUNT(*) FILTER (WHERE l_returnflag='R') r_cnt,
        |       CAST(SUM(CASE WHEN l_quantity>40 THEN 1 ELSE 0 END) AS BIGINT) big_cnt
        |FROM lineitem""".stripMargin),

    dfQ("q28_stats_agg",
      """SELECT l_returnflag, ROUND(STDDEV_SAMP(l_quantity),4) sd, ROUND(VAR_SAMP(l_quantity),4) v,
        |       ROUND(CORR(l_quantity, l_extendedprice),4) c
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(stddev_samp("l_quantity"), 4).as("sd"),
          round(var_samp("l_quantity"), 4).as("v"),
          round(corr("l_quantity", "l_extendedprice"), 4).as("c"))
        .orderBy("l_returnflag")
    },

    sameQ("q29_percentile",
      """SELECT o_orderstatus, ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice),2) med
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // HLL++ sketch: no exact oracle (driver rows-only); cross-checked against
    // exact COUNT(DISTINCT) with ±5% tolerance in the ScalaTest suite.
    sparkOnly("q30_approx_distinct") { (s, d) =>
      t(s, d, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
    }
  )
}
