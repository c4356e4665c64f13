package graft.tools

import org.apache.spark.sql.functions._

import graft.EtlSession
import graft.ops.{Association, Resample, Stats}

/** Stats-tier benchmark at a volume the fixtures cannot reach: the
  * q232–q282 family is fixture-priced (sf0.1 ≈ 600k lineitem rows), so
  * a plan that silently degenerates at 100× would never show in
  * BENCH_r{N}.json. Synthesizes DETERMINISTIC inputs (splitmix64 over
  * `spark.range` — no RNG state, identical on every run/partitioning,
  * the AnnBench/GraphBench discipline) and times the three heaviest
  * round-9 stats shapes end to end:
  *
  *  - q236 item-item cosine co-occurrence (`STATS_ROWS` interactions,
  *    default 10M, Zipf-ish items) PLUS one planted 25,000-item bot
  *    user — timed capped (maxBasket=64) and uncapped. The bot is the
  *    real 100-TB hazard shape: its C(25k,2) ≈ 312M pairs all come out
  *    of ONE join key, i.e. ONE task — an irreducible straggler AQE
  *    cannot split — so the uncapped time measures the straggler, not
  *    just volume, and the cap's value is a number, not a comment.
  *  - q243 trimmed mean post-de-window: 10M rows into THREE groups —
  *    the low-cardinality hazard that would funnel the whole table
  *    through 3 sort-window partitions in the row-ranked formulation;
  *    the distinct-value rewrite aggregates first (~30k distinct
  *    values), windows over the small table only.
  *  - q264 classical seasonal decomposition: 10M timestamped events
  *    over ~2,000 days — the row→day aggregation dominates; the
  *    decomposition windows run on the 2,000-row day table.
  *
  * Prints ONE JSON line; numbers recorded in BASELINE.md §v11.
  */
object StatsBench {

  private def h(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b * 0xD1B54A32D192ED03L +
      0x8CB92BA72F3D8DD7L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("STATS_ROWS", "10000000").toLong
    val spark = EtlSession.create("local[32]", 32, "graft-stats-bench")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- q236 shape: (user, item) interactions, heavy-headed items ---
    // The GraphBench hub mixture: 80% of interactions uniform over the
    // item space, 20% concentrated on 100 hot items — each hot item
    // draws ~200× the mean item frequency, the head shape real
    // co-purchase data has. (The previous sqrt-of-uniform draw was
    // mislabelled Zipf-ish: its density RISES linearly toward LARGE
    // ids with a max/mean ratio of only ~2 — no head at all.)
    val nUsers = math.max(nRows / 10, 1000L)
    val nItems = 100000L
    val organic = spark.range(nRows).map { i =>
      val u = java.lang.Math.floorMod(h(i, 1L), nUsers)
      val item =
        if (java.lang.Math.floorMod(h(i, 2L), 5L) == 0L)
          java.lang.Math.floorMod(h(i, 9L), 100L)
        else java.lang.Math.floorMod(h(i, 10L), nItems)
      (u, item)
    }
    // ONE bot user with 25,000 distinct items: C(25k,2) ≈ 312M
    // self-join pairs from a single join key (single-task straggler)
    // uncapped; C(64,2) ≈ 2k capped.
    val bots = spark.range(25000L).map { i =>
      (nUsers, java.lang.Math.floorMod(h(i, 3L), nItems))
    }
    val inter = organic.union(bots).toDF("user_id", "item")
      .repartition(32).cache()
    val nInter = inter.count()

    val (coCap, coCapSec) = time {
      Association.itemItemCosine(inter, "user_id", "item", k = 10,
        minCo = 2L, maxBasket = 64).count()
    }
    val (coRaw, coRawSec) = time {
      Association.itemItemCosine(inter, "user_id", "item", k = 10,
        minCo = 2L).count()
    }

    // --- q243 shape: 3 groups, heavy-tailed integral values ---
    val grouped = spark.range(nRows).map { i =>
      val g = java.lang.Math.floorMod(h(i, 4L), 3L)
      val v = java.lang.Math.floorMod(h(i, 5L), 30000L)
      (g, v * v / 30000L) // quadratic stretch: right-skewed tail
    }.toDF("g", "x").repartition(32).cache()
    grouped.count()
    val (tmRows, tmSec) = time {
      Stats.trimmedMean(grouped, "g", col("x"), alpha = 0.1).count()
    }
    // A/B: the pre-r10 row-ranked formulation (row_number window
    // partitioned by the 3-value key — the whole table through 3 sort
    // tasks), inlined here so the de-window win stays a measured number.
    val (tmOldRows, tmOldSec) = time {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("x"))
      grouped.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")))
        .filter(col("__rn") > floor(col("__n") * 0.1).cast("long") &&
          col("__rn") <= col("__n") - floor(col("__n") * 0.1).cast("long"))
        .groupBy("g").agg(count(lit(1)).as("n_kept"),
          (sum(col("x").cast("decimal(38,0)")).cast("double") /
            count(lit(1))).as("m"))
        .count()
    }

    // --- q205 shape: per-key bounded series, Mann–Kendall ---
    // 1/10th the row budget. The A/B arm is the REJECTED r10 in-row
    // rewrite (collect each series, fold the n² sign comparisons in a
    // projection): it wins at short series but is interpreted,
    // single-thread-per-key, and copies a prefix slice per endpoint —
    // at sf0.1 series lengths it measured 54 s vs the self-join's
    // 1.1 s on the q205 corpus query. Both arms run at n≈100 and
    // n≈400 to show the trend; the production op is the self-join.
    val mkRows = math.max(nRows / 10, 100000L)
    def mkSeries(keys: Long) = {
      val df = spark.range(mkRows).map { i =>
        val k = java.lang.Math.floorMod(h(i, 11L), keys)
        (k, i, i, java.lang.Math.floorMod(h(i, 12L), 64L))
      }.toDF("k", "ts", "o", "x").repartition(32).cache()
      df.count(); df
    }
    def mkInRow(series: org.apache.spark.sql.DataFrame): Long = {
      val grouped = series
        .select(col("k"), struct(col("ts").as("__t"), col("o").as("__o"),
          col("x").as("__x")).as("__e"))
        .groupBy("k").agg(array_sort(collect_list(col("__e"))).as("__arr"))
      val xs = transform(col("__arr"), e => e.getField("__x"))
      val sExpr = when(size(col("__arr")) < 2, lit(0L)).otherwise(
        aggregate(sequence(lit(2), size(col("__arr"))), lit(0L), (acc, j) =>
          acc + aggregate(slice(xs, lit(1), j - 1), lit(0L), (a2, xi) =>
            a2 + when(element_at(xs, j) > xi, 1L)
              .when(element_at(xs, j) < xi, -1L).otherwise(0L))))
      grouped.select(col("k"), sExpr.as("s")).count()
    }
    val s100 = mkSeries(math.max(mkRows / 100, 100L)) // ~100 events/key
    val (mkKeysOut, mkSec) = time {
      Stats.mannKendall(s100, "k", "ts", col("x"), "o").count()
    }
    val (mkInRowKeys, mkInRowSec) = time { mkInRow(s100) }
    s100.unpersist()
    val s400 = mkSeries(math.max(mkRows / 400, 50L)) // ~400 events/key
    val (mkKeys400, mkSec400) = time {
      Stats.mannKendall(s400, "k", "ts", col("x"), "o").count()
    }
    val (mkInRowKeys400, mkInRowSec400) = time { mkInRow(s400) }
    s400.unpersist()

    // --- q205/q207 hot-key arm: ONE planted bot key (STATS_HOT events,
    // default 100k) on top of ~100-event organic keys — the q236
    // bot-user shape transplanted to trend stats. Uncapped, the hot
    // key's C(n,2) ≈ 5×10⁹ sign evaluations all come out of ONE join
    // key = ONE task (AQE cannot split a key); capped (maxSeries=256,
    // C(256,2) ≈ 33k pairs) the key costs the same as 2.5 organic
    // keys. theilSen runs CAPPED ONLY: its exact percentile would
    // buffer the uncapped key's 5×10⁹ slope doubles (~40 GB) in ONE
    // aggregation buffer — the arm would measure an OOM, not a time.
    val hotN = sys.env.getOrElse("STATS_HOT", "100000").toLong
    val hotOrganic = spark.range(mkRows / 10).map { i =>
      val t: Long = i
      val k = java.lang.Math.floorMod(h(i, 13L), mkRows / 1000)
      (k, t, t, java.lang.Math.floorMod(h(i, 14L), 64L))
    }
    val hotBot = spark.range(hotN).map { i =>
      (mkRows, mkRows + i, mkRows + i,
        java.lang.Math.floorMod(h(i, 15L), 64L))
    }
    val sHot = hotOrganic.union(hotBot).toDF("k", "ts", "o", "x")
      .repartition(32).cache()
    sHot.count()
    val (mkHotCapKeys, mkHotCapSec) = time {
      Stats.mannKendall(sHot, "k", "ts", col("x"), "o",
        maxSeries = 256).count()
    }
    val (tsHotCapKeys, tsHotCapSec) = time {
      Stats.theilSen(sHot, "k", "ts", col("x"), maxSeries = 256).count()
    }
    val (mkHotRawKeys, mkHotRawSec) = time {
      Stats.mannKendall(sHot, "k", "ts", col("x"), "o").count()
    }
    sHot.unpersist()

    // --- q234 shape: Brown–Forsythe over the q243 fixture ---
    // same 3-group/10M frame; the A/B arm is the pre-r10 row-ranked
    // median (row_number window on the 3-value key → whole table
    // through 3 sort tasks), vs the distinct-value prefix form.
    val (bfRows, bfSec) = time {
      Stats.brownForsythe(grouped, "g", col("x")).count()
    }
    val (bfOldRows, bfOldSec) = time {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("x"))
      val ranked = grouped.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")))
      val lo = call_function("div", col("__n") + 1, lit(2L))
      val hi = call_function("div", col("__n"), lit(2L)) + 1
      val med2 = ranked.filter(col("__rn") === lo || col("__rn") === hi)
        .groupBy("g").agg(sum("x").as("__sm"), count(lit(1)).as("__cm"))
        .select(col("g"), when(col("__cm") === 1, col("__sm") * 2)
          .otherwise(col("__sm")).as("__med2"))
      grouped.join(med2, "g")
        .select(col("g"), abs(col("x") * 2 - col("__med2")).as("__z"))
        .groupBy("g").agg(count(lit(1)).as("n"),
          sum(col("__z").cast("decimal(38,0)")).as("s"))
        .count()
    }

    // --- q264 shape: 10M events over ~2,000 days ---
    val events = spark.range(nRows).map { i =>
      val day = java.lang.Math.floorMod(h(i, 6L), 2000L)
      val us = day * 86400000000L +
        java.lang.Math.floorMod(h(i, 7L), 86400000000L)
      (us, java.lang.Math.floorMod(h(i, 8L), 10000L))
    }.toDF("us", "v")
      .select(timestamp_micros(col("us")).as("ts"), col("v"))
      .repartition(32).cache()
    events.count()
    val (dcRows, dcSec) = time {
      Resample.classicalDecompose(events, "ts", col("v"), period = 7)
        .count()
    }

    println(
      s"""{"bench":"stats","rows":$nInter,""" +
      s""""cooccur_capped_sec":${f"$coCapSec%.2f"},"cooccur_capped_rows":$coCap,""" +
      s""""cooccur_uncapped_sec":${f"$coRawSec%.2f"},"cooccur_uncapped_rows":$coRaw,""" +
      s""""trimmed_mean_sec":${f"$tmSec%.2f"},"trimmed_mean_groups":$tmRows,""" +
      s""""trimmed_mean_rowwindow_sec":${f"$tmOldSec%.2f"},""" +
      s""""trimmed_mean_rowwindow_groups":$tmOldRows,""" +
      s""""mann_kendall_rows":$mkRows,""" +
      s""""mk_n100_selfjoin_sec":${f"$mkSec%.2f"},"mk_n100_keys":$mkKeysOut,""" +
      s""""mk_n100_inrow_sec":${f"$mkInRowSec%.2f"},""" +
      s""""mk_n100_inrow_keys":$mkInRowKeys,""" +
      s""""mk_n400_selfjoin_sec":${f"$mkSec400%.2f"},"mk_n400_keys":$mkKeys400,""" +
      s""""mk_n400_inrow_sec":${f"$mkInRowSec400%.2f"},""" +
      s""""mk_n400_inrow_keys":$mkInRowKeys400,""" +
      s""""hot_key_events":$hotN,""" +
      s""""mk_hot_capped_sec":${f"$mkHotCapSec%.2f"},""" +
      s""""mk_hot_capped_keys":$mkHotCapKeys,""" +
      s""""mk_hot_uncapped_sec":${f"$mkHotRawSec%.2f"},""" +
      s""""mk_hot_uncapped_keys":$mkHotRawKeys,""" +
      s""""theilsen_hot_capped_sec":${f"$tsHotCapSec%.2f"},""" +
      s""""theilsen_hot_capped_keys":$tsHotCapKeys,""" +
      s""""brown_forsythe_sec":${f"$bfSec%.2f"},"brown_forsythe_rows":$bfRows,""" +
      s""""brown_forsythe_rowwindow_sec":${f"$bfOldSec%.2f"},""" +
      s""""brown_forsythe_rowwindow_rows":$bfOldRows,""" +
      s""""decompose_sec":${f"$dcSec%.2f"},"decompose_days":$dcRows}""")
    spark.stop()
  }
}
