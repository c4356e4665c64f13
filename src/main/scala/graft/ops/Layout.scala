package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering — the table-maintenance
  * operator that makes MULTI-column data skipping work at 100 TB.
  * Range-partitioning on one sort key gives tight min/max file
  * statistics on that key only; interleaving the bits of two keys and
  * range-partitioning on the interleaved code gives every file a small
  * rectangle in (x, y) space, so zone-map pruning cuts the scan for
  * predicates on EITHER column (the technique behind
  * Delta/Iceberg-style OPTIMIZE ZORDER BY).
  *
  * Everything is exact integer arithmetic (rank scaling uses integral
  * division, never floats), so the code for a row is engine-reproducible
  * — which is also what makes the operator cross-engine oracle-able.
  * The code column is a sum of codegen'd shift/mask terms: a pure
  * projection, no shuffle beyond the final range partitioning the
  * caller asked for.
  */
object Layout {

  /** N-column Morton interleave of pre-scaled ranks, each in
    * [0, 2^bits): bit i of column j lands at position i·n + j (the
    * last column owns the top bit, so leading splits round-robin the
    * columns highest-order first). */
  def mortonCodeN(xs: Seq[Column], bits: Int): Column = {
    val n = xs.length
    require(n >= 2, s"need at least 2 columns to interleave, got $n")
    require(bits >= 1 && bits * n <= 62,
      s"bits·columns must fit a long: $bits × $n")
    xs.zipWithIndex.flatMap { case (x, j) =>
      (0 until bits).map(i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * n + j))
    }.reduce(_ + _).cast("long")
  }

  /** Two-column form: bit i of x at 2i, bit i of y at 2i+1. */
  def mortonCode(x: Column, y: Column, bits: Int): Column =
    mortonCodeN(Seq(x, y), bits)

  /** Exact integer rank of `c` in [0, 2^bits) given inclusive bounds:
    * ((c − lo) · (2^bits − 1)) div max(hi − lo, 1). Integral `div`
    * keeps the rank engine-exact (double division would round the
    * boundary cells differently per engine). */
  def scaledRank(c: Column, lo: Long, hi: Long, bits: Int): Column =
    call_function("div",
      (c.cast("long") - lit(lo)) * lit((1L << bits) - 1),
      lit(math.max(hi - lo, 1L)))

  /** Append the Morton code of the given columns as column `z`. Bounds
    * come from one (min, max) aggregation — 2·n scalars, corpus-size
    * independent. */
  def withZN(df: DataFrame, cs: Seq[String], bits: Int = 16): DataFrame = {
    val boundAggs = cs.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val r = df.agg(boundAggs.head, boundAggs.tail: _*).head()
    val ranks = cs.zipWithIndex.map { case (c, j) =>
      require(!r.isNullAt(2 * j), s"withZ: no non-null values in $c")
      scaledRank(col(c), r.getLong(2 * j), r.getLong(2 * j + 1), bits)
    }
    df.withColumn("z", mortonCodeN(ranks, bits))
  }

  /** Two-column form of [[withZN]]. */
  def withZ(df: DataFrame, cx: String, cy: String,
            bits: Int = 16): DataFrame = withZN(df, Seq(cx, cy), bits)

  /** Cluster `df` into `nFiles` z-ordered range partitions (write each
    * partition as one file and every file holds a small hyper-rectangle
    * in the clustered columns — the data-skipping layout). The z column
    * is internal and dropped from the output. */
  def zorderByN(df: DataFrame, cs: Seq[String],
                bits: Int = 16, nFiles: Int = 8): DataFrame = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    withZN(df, cs, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
  }

  /** Two-column form of [[zorderByN]]. */
  def zorderBy(df: DataFrame, cx: String, cy: String,
               bits: Int = 16, nFiles: Int = 8): DataFrame =
    zorderByN(df, Seq(cx, cy), bits, nFiles)

  /** Hilbert-curve index of two pre-scaled rank columns, each in
    * [0, 2^bits): the classic quadrant-rotation walk (xy2d), appended
    * as column `out`. The Hilbert curve never jumps — consecutive
    * indexes are always grid-neighbors (asserted in the suite), unlike
    * Morton's quadrant seams — so range-partitioned files get tighter
    * (x, y) rectangles and zone maps prune more for the same file
    * count. Everything is exact integer CASE/shift/xor arithmetic:
    * engine-reproducible, hence oracle-able.
    *
    * The iteration mutates (x, y, d) with cross-references between x
    * and y, so a single nested Column expression would grow
    * EXPONENTIALLY in `bits`; each of the `bits` steps is instead a
    * named projection stage (withColumn), which Catalyst keeps —
    * aliases referenced more than once don't collapse — and
    * whole-stage codegen fuses back into one pass. Plan size stays
    * linear in bits; still a pure zero-shuffle projection. */
  def withHilbertCode(df: DataFrame, xr: Column, yr: Column, bits: Int,
                      out: String = "h"): DataFrame = {
    require(bits >= 1 && 2 * bits <= 62,
      s"2·bits must fit a long: bits = $bits")
    var cur = df.withColumn("__hx", xr.cast("long"))
      .withColumn("__hy", yr.cast("long"))
      .withColumn("__hd", lit(0L))
    for (k <- (bits - 1) to 0 by -1) {
      val s = 1L << k
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
      cur = cur
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hy"))
            .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__ny", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hx"))
            .otherwise(col("__hx"))).otherwise(col("__hy")))
      cur = cur.withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
    }
    cur.withColumn(out, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry", "__nx", "__ny")
  }

  /** Append the Hilbert index of two raw columns as column `h`:
    * bounds from one 4-scalar aggregation, exact integral rank
    * scaling ([[scaledRank]]), then [[withHilbertCode]]. */
  def withH(df: DataFrame, cx: String, cy: String,
            bits: Int = 8): DataFrame = {
    val r = df.agg(min(col(cx).cast("long")), max(col(cx).cast("long")),
      min(col(cy).cast("long")), max(col(cy).cast("long"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"withH: no non-null values in $cx/$cy")
    withHilbertCode(df,
      scaledRank(col(cx), r.getLong(0), r.getLong(1), bits),
      scaledRank(col(cy), r.getLong(2), r.getLong(3), bits), bits)
  }

  /** Cluster into `nFiles` Hilbert-ordered range partitions — the
    * drop-in alternative to [[zorderBy]] with strictly better locality
    * per seam. */
  def hilbertOrderBy(df: DataFrame, cx: String, cy: String,
                     bits: Int = 8, nFiles: Int = 8): DataFrame = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    withH(df, cx, cy, bits)
      .repartitionByRange(nFiles, col("h"))
      .sortWithinPartitions("h")
      .drop("h")
  }

  /** Zone-map pruning report — the "did the layout actually help?"
    * measurement that should gate any OPTIMIZE ZORDER run. Rows are
    * assigned to `chunks` equal-WIDTH key-range chunks per candidate
    * layout key (chunk = (key − lo)·chunks div (hi − lo + 1), a pure
    * projection — the model of range-partitioned files without a
    * global sort), per-chunk (min, max) zone maps are computed for the
    * two probe columns, and a box predicate xLo..xHi × yLo..yHi is
    * tested against each chunk's rectangle. One summary row per layout:
    * how many chunks (and rows) a zone-map-pruning scan must read.
    *
    * All integer arithmetic, so the report is engine-exact. Per layout:
    * one 2-scalar bounds aggregation (driver state: two longs) + one
    * grouped aggregation on ≤ `chunks` keys. A linearly-sorted layout
    * key gives chunks spanning the full (x, y) space — nearly every
    * chunk intersects the box; a z-order key gives small rectangles and
    * prunes most of them (asserted in the suite). */
  def pruningReport(df: DataFrame, layouts: Seq[(String, Column)],
                    chunks: Int, xCol: String, yCol: String,
                    xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    require(chunks >= 1, s"chunks must be positive, got $chunks")
    require(layouts.nonEmpty, "pruningReport: no layouts")
    layouts.map { case (name, key) =>
      val keyed = df.select(key.cast("long").as("k"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      val r = keyed.agg(min("k"), max("k")).head()
      require(!r.isNullAt(0), s"pruningReport: no non-null keys in $name")
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val chunk = call_function("div",
        (col("k") - lit(lo)) * lit(chunks.toLong), lit(hi - lo + 1L))
      val zones = keyed.groupBy(chunk.as("chunk"))
        .agg(count(lit(1)).as("rows"),
          min("x").as("xmin"), max("x").as("xmax"),
          min("y").as("ymin"), max("y").as("ymax"))
        .withColumn("hit",
          !(col("xmax") < xLo || col("xmin") > xHi ||
            col("ymax") < yLo || col("ymin") > yHi))
      zones.agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("chunks_hit"),
          sum("rows").as("rows_total"),
          sum(when(col("hit"), col("rows")).otherwise(0L)).as("rows_read"))
        .select(lit(name).as("layout"), col("n_chunks"), col("chunks_hit"),
          col("rows_total"), col("rows_read"))
    }.reduce(_ unionAll _)
  }
}
