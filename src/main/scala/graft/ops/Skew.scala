package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY.md §4; builder brief "salting for
  * skew"). AQE's skew-join splitting handles most cases at runtime; these
  * are the explicit, deterministic variants for when the skew is known
  * up front (a hot key carrying a large fraction of a 100 TB fact table).
  */
object Skew {

  /** Two-phase aggregation: partial-aggregate on (key, salt) — spreading a
    * hot key over `salts` reducers — then final-aggregate on key. The salt
    * is a deterministic hash of `saltFrom` (a unique-ish column), so runs
    * are reproducible.
    *
    * Only aggregates that re-combine losslessly are supported: `sum`,
    * `count`, `min`, `max` (counts re-combine by summing partials). Derive
    * `avg` by composition — request sum + count and divide in a projection;
    * non-decomposable aggs (distinct counts, percentiles) don't fit the
    * two-phase shape and are rejected up front. */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltFrom: String,
                      salts: Int,
                      partial: Seq[(String, String, String)]): DataFrame = {
    // partial: (inputCol, aggFn in {sum,count,min,max}, outName)
    require(partial.nonEmpty, "saltedAggregate needs at least one aggregate")
    require(salts > 0, s"salts must be positive, got $salts")
    val bad = partial.collect {
      case (_, f, _) if !Set("sum", "count", "min", "max")(f) => f }
    require(bad.isEmpty,
      s"unsupported agg(s) ${bad.mkString(",")}: only sum/count/min/max " +
        "re-combine losslessly across salts (compose avg as sum+count)")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(salts.toLong)))
    val phase1 = salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partial.head match { case (c, f, o) => callAgg(f, c).as(o) },
        partial.tail.map { case (c, f, o) => callAgg(f, c).as(o) }: _*)
    val phase2Aggs = partial.map { case (_, f, o) =>
      val refn = if (f == "count") "sum" else f // counts re-combine by sum
      callAgg(refn, o).as(o)
    }
    phase1.groupBy(keyCols.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  private def callAgg(fn: String, c: String) = fn match {
    case "sum"   => sum(col(c))
    case "count" => count(col(c))
    case "min"   => min(col(c))
    case "max"   => max(col(c))
    case other   => throw new IllegalArgumentException(s"agg $other")
  }

  /** Salted broadcast-defeating join for a skewed fact ⋈ dim: the fact side
    * gets a deterministic salt in [0, salts); the dim side is replicated
    * `salts` times; the join key becomes (key, salt). Row multiplicity is
    * unchanged — each fact row matches exactly one dim replica. Use when
    * the dim is too big to broadcast and the fact key is hot. */
  /** Key-skew profile — the diagnostic you run BEFORE deciding whether
    * a join/agg key needs salting ([[saltedJoin]]/[[saltedAggregate]]) or
    * AQE skew-split will do: per key-column, the key count, total rows,
    * the heaviest key's share, the p50/p90/p99 per-key row counts, and
    * the top key itself. ONE grouped count per profiled column (the
    * key-cardinality table), then exact percentiles + a max-rank pick
    * over THAT table — all value-cardinality-sized after the first
    * shuffle. Shares divide exact integers once; the tail percentiles
    * use BINARY-EXACT fractions (½, ⅞, 63/64 — the equi-depth
    * discipline) so both engines parse identical interpolation
    * points. */
  def keyProfile(df: DataFrame, keyCols: Seq[String],
                 exact: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "keyProfile: need at least one key column")
    // exact=false: the 100 TB dial — the exact percentiles buffer the
    // whole per-key COUNTS table (|distinct keys| longs; ~8 GB for a
    // 10⁹-key user-id column) in one final agg buffer. The t-digest
    // swap keeps the profile's purpose (order-of-magnitude skew
    // readout) at sketch-sized state.
    def pct(p: Double): org.apache.spark.sql.Column =
      if (exact) percentile(col("c"), lit(p))
      // cast: exact `percentile` returns DOUBLE but approx_percentile
      // preserves the input type — cast the INPUT so both dials share
      // one schema (schema-sensitive consumers, exact-vs-approx A/Bs)
      else approx_percentile(col("c").cast("double"), lit(p), lit(10000))
    val per = keyCols.map { k =>
      val counts = df.groupBy(col(k).cast("string").as("__k"))
        .agg(count(lit(1)).as("c"))
      val ranked = counts.withColumn("__rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("__k"))))
      ranked.agg(
        lit(k).as("key_col"),
        count(lit(1)).cast("long").as("n_keys"),
        sum(col("c")).cast("long").as("n_rows"),
        (max(col("c")).cast("double") / sum(col("c"))).as("max_share"),
        pct(0.5).as("p50"),
        pct(0.875).as("p875"),
        pct(0.984375).as("p984"),
        min(when(col("__rk") === 1, col("__k"))).as("top_key"),
        max(col("c")).cast("long").as("top_count"))
    }
    per.reduce(_ unionByName _)
  }

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFrom: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(salts.toLong)))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
