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

  /** Morton interleave of two pre-scaled ranks, each in [0, 2^bits):
    * bit i of x lands at position 2i, bit i of y at 2i+1 (y owns the
    * top bit, so the leading splits alternate y, x, y, …). */
  def mortonCode(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _).cast("long")
  }

  /** Exact integer rank of `c` in [0, 2^bits) given inclusive bounds:
    * ((c − lo) · (2^bits − 1)) div max(hi − lo, 1). Integral `div`
    * keeps the rank engine-exact (double division would round the
    * boundary cells differently per engine). */
  def scaledRank(c: Column, lo: Long, hi: Long, bits: Int): Column =
    call_function("div",
      (c.cast("long") - lit(lo)) * lit((1L << bits) - 1),
      lit(math.max(hi - lo, 1L)))

  /** Append the Morton code of (cx, cy) as column `z`. Bounds come from
    * one (min, max) aggregation — four scalars, corpus-size
    * independent. */
  def withZ(df: DataFrame, cx: String, cy: String,
            bits: Int = 16): DataFrame = {
    val r = df.agg(min(col(cx).cast("long")), max(col(cx).cast("long")),
      min(col(cy).cast("long")), max(col(cy).cast("long"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"withZ: no non-null values in $cx/$cy")
    val z = mortonCode(
      scaledRank(col(cx), r.getLong(0), r.getLong(1), bits),
      scaledRank(col(cy), r.getLong(2), r.getLong(3), bits), bits)
    df.withColumn("z", z)
  }

  /** Cluster `df` into `nFiles` z-ordered range partitions (write each
    * partition as one file and every file holds a small (cx, cy)
    * rectangle — the data-skipping layout). The z column is internal
    * and dropped from the output. */
  def zorderBy(df: DataFrame, cx: String, cy: String,
               bits: Int = 16, nFiles: Int = 8): DataFrame = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    withZ(df, cx, cy, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
  }
}
