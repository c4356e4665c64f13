package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over per-key [start, end] spans — the
  * gaps-and-islands family: merge overlapping/adjacent validity or
  * activity intervals into maximal islands and report per-key coverage.
  * The classic use at corpus scale is activity stitching (sessions,
  * machine uptime, entitlement windows) where raw spans overlap and
  * double-counting coverage is the standard bug.
  *
  * Shape: everything is TWO ordered window passes over the same per-key
  * partitioning (running max of `end` to detect island breaks, then a
  * running count of breaks as the island id) plus one grouped agg — no
  * self-join, no explode to a per-unit grid (the naive per-second
  * explode is data × duration and dies at 100 TB). Timestamps are
  * compared as exact integers (µs), so island boundaries — and hence
  * the hash — are engine- and partition-invariant given the (start,
  * tiebreak) ordering.
  */
object Intervals {

  /** Merge overlapping-or-touching intervals per key: rows (key, start,
    * end, tiebreak) → one row per maximal island: (key, island, start,
    * end, n_spans). A span starting strictly after the running max end
    * of all earlier spans (ordered by start, tiebreak) opens a new
    * island; `end >= start` is required of the input. Touching spans
    * (next.start == prev.end) merge — coverage treats intervals as
    * half-open [start, end). */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, tieCol: String): DataFrame = {
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__s"), col("__o"))
    val base = df.select(col(keyCol).as("__k"), col(startCol).as("__s"),
      col(endCol).as("__e"), col(tieCol).as("__o"))
    val flagged = base
      .withColumn("__pmax", max(col("__e")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__s") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("__k"), col("__isl"))
      .agg(min(col("__s")).as("start"), max(col("__e")).as("end"),
        count(lit(1)).as("n_spans"))
      .select(col("__k").as(keyCol), col("__isl").cast("long").as("island"),
        col("start"), col("end"), col("n_spans"))
  }

  /** Per-key coverage summary over the merged islands: total covered
    * duration (in the interval columns' own units — pass integral µs or
    * seconds), island count, span count, and the bounding range, from
    * which the idle share follows exactly. */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
               endCol: String, tieCol: String): DataFrame = {
    mergeIntervals(df, keyCol, startCol, endCol, tieCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("n_spans")).cast("long").as("n_spans"),
        sum(col("end") - col("start")).cast("long").as("covered"),
        min(col("start")).as("first_start"),
        max(col("end")).as("last_end"))
  }
}
