package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J8) as a first-class operator.
  *
  * For every left row, attach the latest right row (per key) whose
  * timestamp is at or before the left timestamp — the "current model
  * version / latest price / last purchase as of this event" join that
  * time-series and training pipelines need constantly.
  *
  * Implementation is the union-merge-window plan, the scalable form:
  * union both sides tagged, sort within each key by (ts, side-tag), and
  * carry the last seen right payload forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding frame. Exactly one
  * shuffle on the key (plus the per-partition sort) regardless of the
  * ratio of left to right rows — never a per-row probe or a range
  * cross-product. Ties (equal ts) resolve to the right row (tag sorts
  * right-before-left), matching "at or before" semantics.
  */
object AsOf {

  /** @param left        probe side
    * @param right       reference side (its `payloadCols` are attached)
    * @param keyCol      equi-key present on both sides
    * @param leftTs      timestamp column on `left`
    * @param rightTs     timestamp column on `right`
    * @param payloadCols columns of `right` to carry (null when no match)
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String,
           leftTs: String, rightTs: String,
           payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = right.select(payloadCols.map(col): _*).schema
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts after right on ts ties
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(payloadCols.map(col): _*))
      .select((keyCol +: Seq("__ts", "__side", "__payload")).map(col): _*)
    // align schemas: right side carries nulls for left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols ++ Seq("__ts", "__side", "__payload")).map(col): _*)
    val lAligned = l.select(
      (leftCols ++ Seq("__ts", "__side", "__payload")).map(col): _*)

    // Final tiebreak on the payload struct itself: when multiple RIGHT rows
    // share (key, ts), plain (ts, side) ordering would leave which payload
    // last() carries up to partition order — at odds with the engine's
    // determinism posture (ADVICE r1). Struct ordering is field-by-field,
    // so the largest payload deterministically wins a ts tie. (Requires
    // orderable payload fields — atomic types; maps would need a caller-
    // supplied unique tiebreak column instead.)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = rAligned.unionByName(lAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
    merged.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col(s"__match.$p").as(p)): _*)
  }
}
