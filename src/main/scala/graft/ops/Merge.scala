package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch merge patterns — the load-side staples of an ETL engine
  * (SURVEY.md §3: the reference's pipelines land batches into standing
  * tables; these are the two canonical landing semantics).
  *
  * Formats like Delta/Iceberg implement MERGE INTO natively; on plain
  * parquet the same semantics are two joins. Both operators here are
  * pure DataFrame transforms — the caller owns the rewrite of the
  * target table (overwrite or partition swap), keeping the operators
  * engine-agnostic and oracle-testable.
  */
object Merge {

  /** Upsert: rows from `updates` replace target rows with the same key;
    * unmatched update rows are inserts. Within one batch, multiple
    * updates to a key resolve to the one with the highest `versionCol`
    * (ties: the operator requires a total order — use a unique version).
    * Shuffles both sides once on the key (or broadcasts the small one —
    * left to AQE). */
  def upsert(target: DataFrame, updates: DataFrame, keyCol: String,
             versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(versionCol).desc)
    val latest = updates
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
    target.join(latest.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(latest)
  }

  /** CDC apply — materialize the current snapshot from a change feed
    * carrying inserts, updates AND deletes (the Debezium/Delta
    * APPLY CHANGES shape, which `upsert` lacks): per key, the row with
    * the highest (seqCols…) sequence wins — compared lexicographically,
    * and the caller must make the last seq column a unique tiebreak or
    * "latest" is not well-defined — and wins-by-delete means the key is
    * ABSENT from the output. One shuffle on the key, one ranking
    * window; the op column is consumed, not emitted. */
  def applyChanges(changes: DataFrame, keyCol: String, seqCols: Seq[String],
                   opCol: String, deleteOp: String = "D"): DataFrame =
    // null-safe: a malformed CDC row with a NULL op that wins the
    // sequence race must SURFACE in the snapshot, not vanish silently
    // (=!= evaluates to NULL on NULL and the filter drops it).
    applyChangesWithTombstones(changes, keyCol, seqCols)
      .filter(!col(opCol).eqNullSafe(deleteOp))
      .drop(opCol)

  /** [[applyChanges]] keeping the winning DELETE rows as tombstones (op
    * column retained) — the form a STANDING CDC table must persist:
    * without the tombstone, a late out-of-order update with a lower
    * sequence would resurrect a deleted key on the next merge. The
    * serving snapshot is `filter(op != deleteOp).drop(op)`; merging two
    * tombstoned tables (or a table with a new change batch) through
    * this same function is associative, which is what makes the
    * streaming batch-by-batch apply equal the one-shot apply. */
  def applyChangesWithTombstones(changes: DataFrame, keyCol: String,
                                 seqCols: Seq[String]): DataFrame = {
    require(seqCols.nonEmpty, "applyChanges: need at least one seq column")
    val w = Window.partitionBy(keyCol)
      .orderBy(seqCols.map(c => col(c).desc): _*)
    changes.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Snapshot diff — change-data-capture between two versions of a
    * keyed table: one row per key that was inserted, deleted, or changed
    * (null-safe struct comparison over `compareCols`), tagged in
    * `change_type`. One full-outer join on the key; unchanged keys are
    * filtered before the tag projection so the output is only the delta
    * — the thing a downstream incremental pipeline consumes. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    // presence flags are sentinel columns, so keys survive even when all
    // their attribute values are null
    val withFlags = oldDf.select(col(keyCol) +:
        compareCols.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__op", lit(1))
      .join(newDf.select(col(keyCol) +:
          compareCols.map(c => col(c).as(s"__n_$c")): _*)
        .withColumn("__np", lit(1)), Seq(keyCol), "full_outer")
    val changed = struct(compareCols.map(c => col(s"__o_$c")): _*) =!=
      struct(compareCols.map(c => col(s"__n_$c")): _*)
    withFlags
      .withColumn("change_type",
        when(col("__op").isNull, lit("insert"))
          .when(col("__np").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(col(keyCol) +: col("change_type") +:
        compareCols.flatMap(c =>
          Seq(col(s"__o_$c").as(s"old_$c"), col(s"__n_$c").as(s"new_$c"))): _*)
  }

  /** SCD Type-2 apply: maintain a dimension history with
    * (valid_from, valid_to) validity intervals, `valid_to` NULL = open.
    *
    * For each update (latest per key within the batch, by `tsCol`):
    * if the key's open row differs on any of `attrCols`, the open row is
    * closed at the update ts and a new open row starts there; identical
    * attributes are a no-op (idempotent re-loads); unknown keys insert a
    * new open row. History rows (valid_to set) pass through untouched.
    *
    * One shuffle on the key; attribute comparison is a null-safe struct
    * equality, so NULL attribute values compare stably. */
  def scd2Apply(current: DataFrame, updates: DataFrame, keyCol: String,
                tsCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2Apply needs at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc)
    val latest = updates
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
      .select(col(keyCol) +: col(tsCol).as("__uts") +:
        attrCols.map(a => col(a).as(s"__u_$a")): _*)
    val history = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val joined = open.join(latest, Seq(keyCol), "full_outer")
    val changed = struct(attrCols.map(col): _*) =!=
      struct(attrCols.map(a => col(s"__u_$a")): _*)
    val hasOpen = col("valid_from").isNotNull
    val hasUpd = col("__uts").isNotNull
    // open rows: unchanged keys keep their row; superseded rows close
    val keptOpen = joined.filter(hasOpen && (!hasUpd || !changed))
      .select(open.columns.map(col): _*)
    val closed = joined.filter(hasOpen && hasUpd && changed)
      .select(open.columns.map {
        case "valid_to" => col("__uts").as("valid_to")
        case c          => col(c)
      }: _*)
    val opened = joined.filter(hasUpd && (!hasOpen || changed))
      .select(open.columns.map {
        case "valid_from" => col("__uts").as("valid_from")
        case "valid_to"   => lit(null).cast(
          open.schema("valid_to").dataType).as("valid_to")
        case c if attrCols.contains(c) => col(s"__u_$c").as(c)
        case c            => col(c)
      }: _*)
    history.unionByName(keptOpen).unionByName(closed).unionByName(opened)
  }
}
