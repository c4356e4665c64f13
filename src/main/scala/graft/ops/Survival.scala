package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — the churn/retention readout of an
  * events pipeline: "what fraction of users are still active t days after
  * their first event", with users whose observation window ends before
  * they churn counted as censored rather than dropped (dropping them
  * biases survival down; counting them as churned biases it up).
  *
  * Scale shape: subjects collapse to one row per (group, duration) with
  * death/censor counts — ONE shuffle on (group, t) — then the at-risk
  * counts are a descending-time running sum over that collapsed table
  * (window over distinct durations, not subjects), and the product-limit
  * curve folds the per-time factors in ascending-time order. Distinct
  * durations per group bound both the window and the fold (use day/week
  * granularity at 100 TB, never raw microseconds), so per-group state is
  * O(distinct times), independent of subject count.
  *
  * Determinism: every count is integral; each factor 1 − d/n is ONE
  * double division; the running product is an ordered left fold over the
  * ascending-time factor array (the q181 EWMA discipline), so the
  * survival doubles are bit-identical on any engine and partitioning —
  * DuckDB replays the fold with `LIST_REDUCE(fs[1:i], (a,b) -> a*b)`.
  */
object Survival {

  /** Product-limit curve from a subject table: one input row per subject
    * with an integral `durationCol` and a boolean `observedCol` (true =
    * the terminal event happened; false = censored at that duration).
    * Returns one row per (group, event time): at-risk `n_risk`, deaths
    * `d`, censored-at-t `c`, and `survival` = S(t). Censoring-only times
    * are folded into the at-risk accounting but emit no curve row
    * (standard KM: the curve only steps at death times). */
  def kaplanMeier(df: DataFrame, durationCol: String, observedCol: String,
                  groupCols: Seq[String]): DataFrame = {
    val grp = groupCols.map(col)
    val byT = df.groupBy(grp :+ col(durationCol).as("t"): _*)
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("c"))
    // at-risk just before t = subjects with duration >= t: a running sum
    // over descending t of this group's collapsed (d + c) rows
    val wDesc = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT.withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
    val ev = risk.filter(col("d") > 0)
    // ascending-time ordered fold: factor_i = 1 - d_i/n_i (ONE division),
    // S at step i = ((1*f_1)*f_2)*...*f_i — prefix product via aggregate()
    // over the slice, exactly DuckDB's LIST_REDUCE fold shape
    val arr = ev.groupBy(grp: _*)
      .agg(sort_array(collect_list(struct(
        col("t"), col("d"), col("c"), col("n_risk")))).as("__a"))
      .withColumn("__f", transform(col("__a"),
        e => lit(1.0) - e.getField("d").cast("double") /
          e.getField("n_risk").cast("double")))
    arr.select(grp ++ Seq(col("__f"),
        posexplode(col("__a")).as(Seq("__i", "__e"))): _*)
      .select(grp ++ Seq(
        col("__e.t").as("t"), col("__e.d").as("d"), col("__e.c").as("c"),
        col("__e.n_risk").as("n_risk"),
        aggregate(slice(col("__f"), lit(1), col("__i") + 1),
          lit(1.0), (acc, f) => acc * f).as("survival")): _*)
  }

  /** Nelson–Aalen cumulative-hazard estimator — the additive companion
    * to [[kaplanMeier]]: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ. Preferred over
    * −ln(S_KM) when hazards themselves are the readout (failure-rate
    * trending, hazard-ratio eyeballing) and numerically gentler with
    * tiny at-risk sets (no product collapsing to 0). Same collapsed
    * (group, t) table and descending-time at-risk window as KM — the
    * ONLY difference is the ascending-time fold adds the one-division
    * dᵢ/nᵢ terms instead of multiplying 1 − dᵢ/nᵢ factors, so the
    * same O(distinct times) state bound and the same bit-exact
    * LIST_REDUCE replay hold. Also emits the Aalen variance terms
    * Σ dᵢ/nᵢ² (each term ONE division of an exact integer ratio). */
  def nelsonAalen(df: DataFrame, durationCol: String, observedCol: String,
                  groupCols: Seq[String]): DataFrame = {
    val grp = groupCols.map(col)
    val byT = df.groupBy(grp :+ col(durationCol).as("t"): _*)
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("c"))
    val wDesc = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT.withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
    val ev = risk.filter(col("d") > 0)
    val arr = ev.groupBy(grp: _*)
      .agg(sort_array(collect_list(struct(
        col("t"), col("d"), col("c"), col("n_risk")))).as("__a"))
      .withColumn("__h", transform(col("__a"),
        e => e.getField("d").cast("double") /
          e.getField("n_risk").cast("double")))
      .withColumn("__v", transform(col("__a"),
        e => e.getField("d").cast("double") /
          (e.getField("n_risk") * e.getField("n_risk")).cast("double")))
    arr.select(grp ++ Seq(col("__h"), col("__v"),
        posexplode(col("__a")).as(Seq("__i", "__e"))): _*)
      .select(grp ++ Seq(
        col("__e.t").as("t"), col("__e.d").as("d"), col("__e.c").as("c"),
        col("__e.n_risk").as("n_risk"),
        aggregate(slice(col("__h"), lit(1), col("__i") + 1),
          lit(0.0), (acc, h) => acc + h).as("cum_hazard"),
        aggregate(slice(col("__v"), lit(1), col("__i") + 1),
          lit(0.0), (acc, v) => acc + v).as("hazard_var")): _*)
  }

  private val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Two-group log-rank test — did arm 1's survival curve differ from
    * the rest (the churn A/B readout on top of [[kaplanMeier]]): at
    * each death time, compare arm 1's observed deaths O₁ = d₁ with its
    * hypergeometric expectation E₁ = d·n₁/n under "no difference",
    *
    *   χ² = (ΣO₁ − ΣE₁)² / ΣV,   V = d·n₁·(n−n₁)·(n−d) / (n²·(n−1))
    *
    * — the Cochran–Mantel–Haenszel statistic ([[Stats.cmh]]) with event
    * times as the strata. Same collapsed (t) table and descending-time
    * at-risk windows as KM, ONE shuffle on t; per-time E and V are
    * exact DECIMAL(38) integer ratios divided ONCE each, and the ΣE/ΣV
    * double sums fold in ascending-time order inside one row (the
    * q232 LIST_REDUCE shape — bounded by distinct event times, which
    * the KM contract already keeps coarse at 100 TB: day/week buckets,
    * never raw microseconds). Times with n = 1 contribute zero
    * variance (the n−1 = 0 degenerate stratum, the [[Stats.cmh]]
    * rule). NULL chi2 when ΣV = 0. */
  def logRank(df: DataFrame, durationCol: String, observedCol: String,
              inArm1: Column): DataFrame = {
    val byT = df.groupBy(col(durationCol).as("t"))
      .agg(sum(when(col(observedCol) && inArm1, 1L).otherwise(0L)).as("d1"),
        sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        sum(when(inArm1, 1L).otherwise(0L)).as("a1"),
        count(lit(1)).as("a"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT
      .withColumn("n1", sum("a1").over(wDesc))
      .withColumn("n", sum("a").over(wDesc))
    val ev = risk.filter(col("d") > 0)
      .withColumn("__e1", (col("d").cast(dec38) * col("n1"))
        .cast("double") / col("n").cast("double"))
      .withColumn("__v", when(col("n") <= 1, lit(0.0)).otherwise(
        (col("d").cast(dec38) * col("n1") * (col("n") - col("n1")) *
          (col("n") - col("d"))).cast("double") /
          (col("n").cast(dec38) * col("n") * (col("n") - 1))
            .cast("double")))
    val folded = ev
      .agg(count(lit(1)).as("n_times"),
        coalesce(sum("d1"), lit(0L)).as("o1"),
        sort_array(collect_list(struct(
          col("t"), col("__e1"), col("__v")))).as("__a"))
      .select(col("n_times"), col("o1"),
        aggregate(transform(col("__a"), e => e.getField("__e1")),
          lit(0.0), (acc, v) => acc + v).as("e1"),
        aggregate(transform(col("__a"), e => e.getField("__v")),
          lit(0.0), (acc, v) => acc + v).as("v"))
    val dlt = col("o1").cast("double") - col("e1")
    folded.select(col("n_times"), col("o1"), col("e1"), col("v"),
      when(col("v") <= 0, lit(null)).otherwise(dlt * dlt / col("v"))
        .as("chi2"))
  }

  /** Restricted mean survival time — the AREA under the Kaplan–Meier
    * curve up to a horizon τ: RMST(τ) = ∫₀^τ S(t)dt, "the average
    * survival/retention time a subject banks within the first τ days"
    * — the one-number KM summary that stays defined under censoring
    * (the raw mean doesn't) and the standard effect readout when
    * hazards aren't proportional.
    *
    * Composes [[kaplanMeier]]: per step, the curve contributes
    * S(tᵢ)·(min(tᵢ₊₁, τ) − min(tᵢ, τ)) (zero once tᵢ ≥ τ), plus the
    * head rectangle 1·min(t₁, τ); contributions fold in ascending-time
    * order INSIDE one row (bounded by the group's distinct event
    * times — the KM state contract), so the double result
    * hash-replays. Groups with no OBSERVED event are absent (the KM
    * output convention; their KM curve never drops, so their RMST is
    * trivially τ). */
  def rmst(df: DataFrame, durationCol: String, observedCol: String,
           groupCols: Seq[String], tau: Double): DataFrame = {
    require(tau > 0, s"tau must be > 0, got $tau")
    val grp = groupCols.map(col)
    val km = kaplanMeier(df, durationCol, observedCol, groupCols)
    val w = Window.partitionBy(grp: _*).orderBy(col("t"))
    val tl = lit(tau)
    val contrib = col("survival") *
      (least(coalesce(col("__nt").cast("double"), tl), tl) -
        least(col("t").cast("double"), tl))
    km.withColumn("__nt", lead(col("t"), 1).over(w))
      .select(grp ++ Seq(col("t"), contrib.as("__c")): _*)
      .groupBy(grp: _*)
      .agg(min(col("t")).as("__t1"),
        aggregate(array_sort(collect_list(struct(col("t"), col("__c")))),
          lit(0.0), (a, e) => a + e.getField("__c")).as("__area"))
      .select(grp ++ Seq(tl.as("tau"),
        (least(col("__t1").cast("double"), tl) + col("__area"))
          .as("rmst")): _*)
  }

  /** Subject table for user-churn KM over the events fixture: per user,
    * duration = whole days between first and last event, observed =
    * the user's last event ends `quietUs` microseconds or more before
    * the corpus's last event (quiet long enough to call churned); users
    * still active near the corpus edge are censored. The corpus-end
    * scalar is a broadcast one-row cross join, not a collect. */
  def userLifetimes(events: DataFrame, userCol: String, tsCol: String,
                    quietUs: Long): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("__first"),
        max(unix_micros(col(tsCol))).as("__last"))
    val corpusEnd = events.agg(max(unix_micros(col(tsCol))).as("__end"))
    perUser.crossJoin(broadcast(corpusEnd))
      .select(col(userCol),
        // integral `div`, not `/`: long / long is a double divide in
        // Spark, and a quotient landing on a representability boundary
        // could truncate differently than DuckDB's integer `//`
        call_function("div", col("__last") - col("__first"),
          lit(86400000000L)).as("duration_days"),
        (col("__last") <= col("__end") - lit(quietUs)).as("observed"))
  }
}
