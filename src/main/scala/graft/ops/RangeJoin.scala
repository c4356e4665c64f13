package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band-bucketed interval join — the 100 TB execution pattern for
  * "right.ts within (left.ts, left.ts + H]" shapes (SURVEY.md §4.3).
  *
  * The naive formulation joins on the equi-key and evaluates the band
  * predicate as a residual; that is fine while each key group fits in a
  * task, but a hot key with millions of events degenerates to O(n²) within
  * the group. Bucketing by `floor(ts / H)` bounds the work: a pair whose
  * gap is in (0, H] must land in the same or adjacent bucket, so
  * replicating the LEFT side into its own and the next bucket and
  * equi-joining on (key, bucket) visits each candidate pair exactly once
  * (the right row's bucket is unique, so no dedup pass is needed).
  * Join fan-in per task is then bounded by 2 buckets per key, whatever the
  * key skew, and the planner sees a plain equi-join it can hash/SMJ.
  */
object RangeJoin {

  /** Pairs (l, r) with l.key = r.key and r.ts in (l.ts, l.ts + `bandMicros`].
    *
    * `left`/`right` must both have `keyCol` and `tsCol` (timestamp type).
    * Output columns: left.* (aliased `l_`-prefixed? no — original names),
    * right columns renamed with `rightPrefix`. Band width = interval size.
    */
  def intervalFollowJoin(left: DataFrame, right: DataFrame,
                         keyCol: String, tsCol: String,
                         bandMicros: Long,
                         rightPrefix: String = "r_"): DataFrame = {
    val lb = unix_micros(col(tsCol))
    val l2 = left
      .withColumn("__lbucket",
        explode(array(floor(lb / bandMicros), floor(lb / bandMicros) + 1)))
    val rRenamed = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, rightPrefix + c)
    }
    val rb = unix_micros(col(rightPrefix + tsCol))
    val r2 = rRenamed.withColumn("__rbucket", floor(rb / bandMicros))
    l2.join(r2,
      col(keyCol) === col(rightPrefix + keyCol) &&
        col("__lbucket") === col("__rbucket") &&
        col(rightPrefix + tsCol) > col(tsCol) &&
        unix_micros(col(rightPrefix + tsCol)) <= unix_micros(col(tsCol)) + bandMicros)
      .drop("__lbucket", "__rbucket")
  }
}
