package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Descriptive multi-column statistics computed the scale-right way:
  * everything from ONE scan, ONE aggregation.
  *
  * The naive correlation matrix loops `df.stat.corr(a, b)` over pairs —
  * k·(k−1)/2 full scans of a 100 TB table. Here all pairwise moments ride
  * a single Aggregate (Spark's corr/covar are single-pass streaming
  * aggregates with map-side partials), the one-row result is exploded to
  * long format driver-free, and the scan reads only the k probed columns
  * (column pruning reaches the parquet scan — asserted in the suite).
  */
object Stats {

  /** Long-format Pearson correlation + sample covariance over every
    * unordered column pair: (col_a, col_b, corr, cov) with col_a < col_b
    * in the given order. One job, one scan, one shuffle-free final row.
    * NULLs are handled pairwise (Spark/ANSI corr semantics: rows where
    * either side is NULL are skipped for that pair). */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.flatMap { case (a, b) =>
      Seq(corr(col(a), col(b)).as(s"__corr_${a}_$b"),
        covar_samp(col(a), col(b)).as(s"__cov_${a}_$b"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__corr_${a}_$b").as("corr"), col(s"__cov_${a}_$b").as("cov"))
    }
    one.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Equi-depth histogram — ANALYZE-style optimizer statistics: `buckets`
    * buckets of (approximately) equal row count, built from ONE exact
    * interpolating percentile aggregation (an array of buckets−1
    * boundaries in a single pass) broadcast back; bucket assignment is a
    * pure projection (count of boundaries strictly below the value).
    * Use a power-of-two bucket count so every percentage k/buckets is
    * binary-exact — both engines then parse identical boundary
    * percentiles, which is what makes the histogram oracle-able. */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         buckets: Int): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val x = col(valueCol).cast("double")
    val ps = (1 until buckets).map(_.toDouble / buckets).toArray
    val bnds = df.agg(percentile(x, typedLit(ps)).as("__bnds"))
    df.crossJoin(broadcast(bnds))
      .withColumn("bucket", size(filter(col("__bnds"), b => x > b)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(x).as("lo"), max(x).as("hi"))
  }

  /** Per-group Welch two-sample t-test: does `valueCol` differ between
    * the rows where `cohort` is true and the rest? Returns one row per
    * group with both cohorts' (n, mean), the t statistic, and the
    * Welch–Satterthwaite degrees of freedom — the A/B readout every
    * events pipeline ends in.
    *
    * ONE scan, ONE aggregation: both cohorts' moments ride the same
    * grouped aggregate as conditional columns (`avg(when(cohort, x))`
    * skips the other cohort's rows as nulls), and the t/df formulas are
    * a projection over the six aggregates — closed-form, no second
    * pass, no per-cohort job. */
  def welchT(df: DataFrame, groupCol: String, cohort: Column,
             valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val a = when(cohort, x); val b = when(!cohort, x)
    val agg = df.groupBy(col(groupCol))
      .agg(count(a).as("n1"), avg(a).as("m1"), var_samp(a).as("v1"),
        count(b).as("n2"), avg(b).as("m2"), var_samp(b).as("v2"))
    // squares spelled x*x, not pow(x, 2): Java Math.pow and C libm pow
    // may differ in the last ulp, multiplication never does
    val se1 = col("v1") / col("n1"); val se2 = col("v2") / col("n2")
    val se = se1 + se2
    agg
      .withColumn("t", (col("m1") - col("m2")) / sqrt(se))
      .withColumn("df",
        (se * se) /
          (se1 * se1 / (col("n1") - 1) + se2 * se2 / (col("n2") - 1)))
  }
}
