package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log — the batch analogue of the
  * streaming session windows (ST3), and the standard prerequisite for
  * funnel/engagement analytics over the events table.
  *
  * A session breaks when the gap to the user's previous event exceeds
  * `gapSeconds`. One shuffle on the user key; the boundary detection is
  * two window functions over the same (user, ts) sort — lag to find the
  * gap, cumulative sum of boundary flags to number sessions — so Catalyst
  * plans a single Window exchange+sort. Deterministic: the sort tiebreak
  * is the caller-supplied unique `orderCol` (event id).
  */
object Sessionize {

  /** Append `session_seq` (1-based per user) to `events`. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 orderCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val boundary = when(col("__prev").isNull ||
      col(tsCol) > col("__prev") + expr(s"INTERVAL $gapSeconds SECONDS"), 1L)
      .otherwise(0L)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("session_seq",
        sum(boundary).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__prev")
  }

  /** Per-session aggregates: event count, start/end, value sum. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   orderCol: String, gapSeconds: Long,
                   valueCol: String): DataFrame =
    sessionize(events, userCol, tsCol, orderCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol)).as("sum_value"))
}
