package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate (rollup) maintenance — keep a standing per-key
  * aggregate table current by folding in pre-aggregated delta batches,
  * never rescanning raw history.
  *
  * This is the 100 TB summary-table discipline: the raw corpus is
  * append-only and unbounded, but every measure here is a commutative
  * monoid (count/sum add, min/max meet/join, HLL sketches union), so the
  * standing state per key is O(1) and a new batch costs
  * O(|batch| + |touched keys|): the batch is aggregated first (map-side
  * partials do most of the work), then ONE shuffle merges two
  * already-small state tables. A full recompute would re-shuffle the
  * entire history every load.
  *
  * Derived statistics that are NOT mergeable (avg, variance, distinct
  * counts) are carried as their mergeable parts (sum+count,
  * sum+sumsq+count, HLL sketch) and divided once at read time —
  * the same single-division discipline the oracle queries use.
  */
object Rollup {

  /** One mergeable measure: `onRaw` folds raw rows into per-key state,
    * `onState` folds states (re-aggregation under the same name). */
  final case class Measure(name: String, onRaw: Column,
                           onState: Column => Column)

  object Measure {
    /** Row count; states add. */
    def rowCount(name: String = "n"): Measure =
      Measure(name, count(lit(1)), c => sum(c).cast("long"))

    /** Sum; states add. Use an exact-additive type (integer cents,
      * BIGINT, DECIMAL) if the rollup must be bit-stable across merge
      * orders — double sums are order-sensitive. */
    def sumOf(name: String, c: Column): Measure =
      Measure(name, sum(c), sum(_))

    /** Min; states meet. */
    def minOf(name: String, c: Column): Measure =
      Measure(name, min(c), min(_))

    /** Max; states join. */
    def maxOf(name: String, c: Column): Measure =
      Measure(name, max(c), max(_))

    /** Mergeable distinct-count state: a Datasketches HLL sketch
      * (binary column). States union losslessly — the union of per-batch
      * sketches IS the sketch of the union, so standing distinct counts
      * never rescan history. Read the estimate with [[estimate]]. */
    def approxDistinct(name: String, c: Column, lgK: Int = 12): Measure =
      Measure(name, hll_sketch_agg(c, lit(lgK)),
        s => hll_union_agg(s, lit(false)))

    /** Project an HLL state column to its cardinality estimate. */
    def estimate(c: Column): Column = hll_sketch_estimate(c)
  }

  /** Parse the declarative measure DSL used by pipeline specs
    * (`LoadSpec(mode="rollup")`): `name=count`, `name=sum(col)`,
    * `name=min(col)`, `name=max(col)`, `name=approx_distinct(col)`.
    * Unknown shapes fail fast with the offending spec string. */
  def parseMeasure(spec: String): Measure = {
    val Fn = """^\s*(\w+)\s*=\s*(\w+)\(\s*([\w.]+)\s*\)\s*$""".r
    val Count = """^\s*(\w+)\s*=\s*count\s*$""".r
    spec match {
      case Count(name)                     => Measure.rowCount(name)
      case Fn(name, "sum", c)              => Measure.sumOf(name, col(c))
      case Fn(name, "min", c)              => Measure.minOf(name, col(c))
      case Fn(name, "max", c)              => Measure.maxOf(name, col(c))
      case Fn(name, "approx_distinct", c)  => Measure.approxDistinct(name, col(c))
      case other => throw new IllegalArgumentException(
        s"rollup measure '$other': expected name=count|sum(c)|min(c)|max(c)|approx_distinct(c)")
    }
  }

  private def keyCols(keys: Seq[String]): Seq[Column] = keys.map(col)

  /** Fold raw rows into per-key state. One shuffle; every measure rides
    * the same grouped aggregation with map-side partials. */
  def aggregate(raw: DataFrame, keys: Seq[String],
                measures: Seq[Measure]): DataFrame = {
    require(measures.nonEmpty, "rollup needs at least one measure")
    val aggs = measures.map(m => m.onRaw.as(m.name))
    raw.groupBy(keyCols(keys): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two state tables (standing ∪ delta) into one: keys present on
    * either side survive, measures combine by their monoid. ONE shuffle
    * over two pre-aggregated inputs — never the raw history. */
  def merge(standing: DataFrame, deltaState: DataFrame, keys: Seq[String],
            measures: Seq[Measure]): DataFrame = {
    val aggs = measures.map(m => m.onState(col(m.name)).as(m.name))
    standing.unionByName(deltaState)
      .groupBy(keyCols(keys): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Convenience: fold a RAW delta batch into a standing state table. */
  def mergeRaw(standing: DataFrame, deltaRaw: DataFrame, keys: Seq[String],
               measures: Seq[Measure]): DataFrame =
    merge(standing, aggregate(deltaRaw, keys, measures), keys, measures)

  /** Incremental JOIN-view maintenance — the equi-join counterpart to
    * the aggregate monoid above: for an append-only materialized view
    * V = A ⋈ B, arriving deltas contribute exactly
    *
    *   ΔV = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * (the cross term once — the standard incremental-view/delta-join
    * identity), so
    * V ∪ ΔV = (A ∪ ΔA) ⋈ (B ∪ ΔB) without ever re-joining the two
    * standing sides. Cost: the deltas join the standing tables (delta-
    * sized probes — broadcast when small, AQE decides) plus the tiny
    * ΔA ⋈ ΔB; the A ⋈ B recompute a naive refresh pays never happens.
    * Returns ΔV with A-columns then B-columns (join key once).
    * Append-only semantics — retractions are the CDC operator's job
    * ([[graft.ops.Merge.applyChanges]]); compose the two for
    * upsert-maintained views. */
  def joinDelta(a: DataFrame, deltaA: DataFrame, b: DataFrame,
                deltaB: DataFrame, key: String): DataFrame =
    deltaA.join(b, key)
      .unionByName(a.join(deltaB, key))
      .unionByName(deltaA.join(deltaB, key))
}
