package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J8) as a first-class operator.
  *
  * For every left row, attach the right row (per key) nearest in time
  * under the chosen direction — the "current model version / latest price
  * / last purchase as of this event" join that time-series and training
  * pipelines need constantly:
  *
  *  - `backward` (default): latest right row at or before the left ts
  *  - `forward`: earliest right row at or after the left ts
  *  - `nearest`: whichever of the two is closer in time (ties → backward,
  *    matching pandas `merge_asof` semantics)
  *
  * Implementation is the union-merge-window plan, the scalable form:
  * union both sides tagged, sort within each key by (ts, side-tag), and
  * carry the adjacent right payload with `last`/`first(..., ignoreNulls)`
  * over a one-sided frame. Exactly ONE shuffle on the key regardless of
  * the ratio of left to right rows — never a per-row probe or a range
  * cross-product ('nearest' adds a second per-partition sort for the
  * opposite tie order, but no extra exchange). Ties (equal ts) resolve to
  * the right row, matching the inclusive "at or before/after" semantics.
  *
  * `tolerance` (optional, pandas-style): a predicate over (leftTs,
  * matchedRightTs) columns; matches failing it are nulled out — e.g.
  * `(l, r) => l - r <= expr("INTERVAL 1 HOUR")` for backward joins on
  * timestamps, or `(l, r) => l - r <= lit(3600)` on numeric ts. With
  * `nearest`, tolerance is applied to EACH direction's candidate before
  * the nearest selection (pandas merge_asof: the nearest SURVIVING
  * candidate wins), and the predicate should be symmetric — use
  * `abs(l - r)` — since it sees both backward and forward candidates.
  */
object AsOf {

  /** @param left        probe side
    * @param right       reference side (its `payloadCols` are attached)
    * @param keyCol      equi-key present on both sides
    * @param leftTs      timestamp column on `left`
    * @param rightTs     timestamp column on `right`
    * @param payloadCols columns of `right` to carry (null when no match)
    * @param direction   "backward" (default) | "forward" | "nearest"
    * @param tolerance   optional (leftTs, matchedRightTs) => keep-match
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String,
           leftTs: String, rightTs: String,
           payloadCols: Seq[String],
           direction: String = "backward",
           tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val leftCols = left.columns.toSeq
    // The right ts rides inside the payload struct (as __rts) so 'nearest'
    // can compare distances and 'tolerance' can see the matched ts.
    val innerCols = payloadCols :+ "__rts"
    val payloadType = right
      .withColumn("__rts", col(rightTs))
      .select(innerCols.map(col): _*).schema
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts after right on ts ties
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .withColumn("__rts", col(rightTs))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(innerCols.map(col): _*))
      .select((keyCol +: Seq("__ts", "__side", "__payload")).map(col): _*)
    // align schemas: right side carries nulls for left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols ++ Seq("__ts", "__side", "__payload")).map(col): _*)
    val lAligned = l.select(
      (leftCols ++ Seq("__ts", "__side", "__payload")).map(col): _*)
    val merged = rAligned.unionByName(lAligned)

    // Final tiebreak on the payload struct itself: when multiple RIGHT rows
    // share (key, ts), plain (ts, side) ordering would leave which payload
    // the frame edge carries up to partition order — at odds with the
    // engine's determinism posture (ADVICE r1). Struct ordering is
    // field-by-field, so the extreme payload deterministically wins a ts
    // tie. (Requires orderable payload fields — atomic types; maps would
    // need a caller-supplied unique tiebreak column instead.)
    //
    // Tie order differs by direction: backward scans ...r,r,L (right rows
    // at equal ts sort BEFORE the left row so the preceding frame includes
    // them); forward scans L,r,r... (right rows at equal ts sort AFTER, so
    // the following frame includes them).
    def backMatch: Column = {
      val w = Window.partitionBy(keyCol)
        .orderBy(col("__ts"), col("__side"), col("__payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__payload"), ignoreNulls = true).over(w)
    }
    def fwdMatch: Column = {
      val w = Window.partitionBy(keyCol)
        .orderBy(col("__ts"), col("__side") * -1, col("__payload").desc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      first(col("__payload"), ignoreNulls = true).over(w)
    }
    // Tolerance is applied PER CANDIDATE: for 'nearest' this happens to
    // each direction's candidate BEFORE the nearest selection — pandas
    // merge_asof semantics (a nearer match that fails tolerance does not
    // shadow the opposite-direction match that passes). For 'nearest' the
    // predicate should be symmetric (use abs()), since it sees both
    // backward (l >= r) and forward (l <= r) candidates.
    def tolerate(cand: Column): Column = tolerance.fold(cand) { tol =>
      when(cand.isNotNull && tol(col("__ts"), cand.getField("__rts")), cand)
    }
    val withMatch = direction match {
      case "backward" => merged.withColumn("__match", tolerate(backMatch))
      case "forward"  => merged.withColumn("__match", tolerate(fwdMatch))
      case "nearest"  =>
        // 'nearest' compares distances numerically; a DATE ts would cast
        // to NULL double (non-ANSI) and silently always prefer backward.
        val tsType = left.schema(leftTs).dataType
        require(tsType.isInstanceOf[org.apache.spark.sql.types.NumericType]
            || tsType == org.apache.spark.sql.types.TimestampType
            || tsType == org.apache.spark.sql.types.TimestampNTZType,
          s"direction='nearest' needs a numeric or timestamp ts column; " +
            s"got $tsType for '$leftTs' (cast DATE to timestamp first)")
        // both candidates from the same exchange (two sorts, one shuffle);
        // pick the closer SURVIVING candidate; equal distance → backward
        // (pandas semantics)
        val m = merged.withColumn("__mb", tolerate(backMatch))
          .withColumn("__mf", tolerate(fwdMatch))
        val db = abs(col("__ts").cast("double") -
          col("__mb.__rts").cast("double"))
        val df_ = abs(col("__mf.__rts").cast("double") -
          col("__ts").cast("double"))
        m.withColumn("__match",
          when(col("__mb").isNull, col("__mf"))
            .when(col("__mf").isNull, col("__mb"))
            .when(df_ < db, col("__mf"))
            .otherwise(col("__mb")))
    }
    withMatch.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col(s"__match.$p").as(p)): _*)
  }
}
