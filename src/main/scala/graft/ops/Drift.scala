package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * monitoring gate a standing training-data pipeline runs on every new
  * batch before it lands (did the quality-score / length / value
  * distribution move?).
  *
  * Population Stability Index per numeric column over equal-width
  * buckets anchored to the REFERENCE min/max (exact, cross-engine
  * reproducible — quantile buckets would tie the gate to an engine's
  * quantile sketch):
  *
  *   PSI = Σ_b (p_cur(b) − p_ref(b)) · ln(p_cur(b) / p_ref(b))
  *
  * with ε-floored shares so empty buckets stay finite. The usual field
  * reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate.
  *
  * Scale shape: one aggregation on the reference for (min, max), one
  * single-pass grouped count per side (shuffle on ≤ `buckets` keys —
  * the bucket-count table is buckets-sized regardless of corpus size),
  * one tiny join of the two count tables. Out-of-range current values
  * clamp into the edge buckets, so schema-compatible batches can never
  * error the gate.
  */
object Drift {

  /** One row per column: (column, psi, n_ref, n_cur). */
  def psi(ref: DataFrame, cur: DataFrame, cols: Seq[String],
          buckets: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    require(cols.nonEmpty, "psi: need at least one column")
    require(buckets >= 2, s"psi: need >= 2 buckets, got $buckets")
    require(epsilon > 0, s"psi: epsilon must be positive, got $epsilon")
    cols.map(c => psiOne(ref, cur, c, buckets, epsilon))
      .reduce(_ unionByName _)
  }

  private def psiOne(ref: DataFrame, cur: DataFrame, c: String,
                     buckets: Int, epsilon: Double): DataFrame = {
    val bounds = ref.agg(min(col(c).cast("double")).as("lo"),
      max(col(c).cast("double")).as("hi"))
    // clamped equal-width bucket index on [lo, hi]; degenerate lo == hi
    // puts everything in bucket 0 on both sides → PSI 0
    def bucketed(df: DataFrame): DataFrame =
      df.select(col(c).cast("double").as("x"))
        .filter(col("x").isNotNull)
        .crossJoin(broadcast(bounds))
        .select(least(lit(buckets - 1), greatest(lit(0),
          when(col("hi") === col("lo"), lit(0)).otherwise(
            floor((col("x") - col("lo")) * buckets /
              (col("hi") - col("lo"))).cast("int"))))
          .as("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
    val r = bucketed(ref).withColumnRenamed("n", "nr")
    val k = bucketed(cur).withColumnRenamed("n", "nc")
    // the joined bucket table is <= `buckets` rows — the global window
    // for the share denominators runs over that tiny table, never data
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    // greatest(total, 1): an empty side divides 0/1 instead of erroring
    // under ANSI, and its shares floor to ε like any empty bucket
    val pc = greatest(col("nc") / greatest(sum("nc").over(w), lit(1L)),
      lit(epsilon))
    val pr = greatest(col("nr") / greatest(sum("nr").over(w), lit(1L)),
      lit(epsilon))
    r.join(k, Seq("b"), "full_outer")
      .select(coalesce(col("nr"), lit(0L)).as("nr"),
        coalesce(col("nc"), lit(0L)).as("nc"))
      .select(col("nr"), col("nc"),
        ((pc - pr) * log(pc / pr)).as("term"))
      .agg(sum("term").as("psi"), sum("nr").as("n_ref"),
        sum("nc").as("n_cur"))
      .select(lit(c).as("column"), col("psi"), col("n_ref"), col("n_cur"))
  }
}
