package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * monitoring gate a standing training-data pipeline runs on every new
  * batch before it lands (did the quality-score / length / value
  * distribution move?).
  *
  * Population Stability Index per numeric column over equal-width
  * buckets anchored to the REFERENCE min/max (exact, cross-engine
  * reproducible — quantile buckets would tie the gate to an engine's
  * quantile sketch):
  *
  *   PSI = Σ_b (p_cur(b) − p_ref(b)) · ln(p_cur(b) / p_ref(b))
  *
  * with ε-floored shares so empty buckets stay finite. The usual field
  * reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate.
  *
  * Scale shape — single-pass across ALL monitored columns (the
  * [[Quality.profile]] pattern; VERDICT r4 #4 — the per-column loop
  * cost ~3k scans for k columns as a standing per-batch monitor): ONE
  * aggregation on the reference computes every column's (min, max); ONE
  * stacked projection per side emits (column, bucket) pairs for every
  * column from a single scan; ONE grouped count per side (shuffle on
  * ≤ k·`buckets` keys — corpus-size independent); one tiny join of the
  * two count tables. Out-of-range current values clamp into the edge
  * buckets, so schema-compatible batches can never error the gate.
  */
object Drift {

  /** One row per column: (column, psi, n_ref, n_cur), in `cols` order. */
  def psi(ref: DataFrame, cur: DataFrame, cols: Seq[String],
          buckets: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    require(cols.nonEmpty, "psi: need at least one column")
    require(buckets >= 2, s"psi: need >= 2 buckets, got $buckets")
    require(epsilon > 0, s"psi: epsilon must be positive, got $epsilon")
    // one reference pass: every column's exact (min, max)
    val boundAggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("double")).as(s"lo_$i"),
        max(col(c).cast("double")).as(s"hi_$i"))
    }
    val bounds = ref.agg(boundAggs.head, boundAggs.tail: _*)
    // ref and cur tag-and-union into ONE stream so the bounds broadcast,
    // the stacked bucket projection, and the grouped count each appear
    // exactly once in the plan (Catalyst does not dedupe common
    // subtrees — a per-side bucketed() helper would scan the bounds
    // subtree twice). Side totals then pivot out of the single count
    // table with conditional sums, which also replaces the old
    // full-outer join of two count tables.
    def tagged(df: DataFrame, side: String): DataFrame =
      df.select(lit(side).as("__side") +:
        cols.map(c => col(c).cast("double").as(c)): _*)
    // clamped equal-width bucket index on [lo, hi]; degenerate lo == hi
    // puts everything in bucket 0 on both sides → PSI 0. All columns
    // stack into (column, bucket) pairs in ONE projection over ONE scan;
    // NULL values drop per column, exactly as a per-column loop would.
    val counts = tagged(ref, "r").unionByName(tagged(cur, "c"))
      .crossJoin(broadcast(bounds))
      .select(col("__side"),
        explode(array(cols.zipWithIndex.map { case (c, i) =>
          val x = col(c)
          val lo = col(s"lo_$i"); val hi = col(s"hi_$i")
          struct(lit(c).as("column"), x.as("x"),
            least(lit(buckets - 1), greatest(lit(0),
              when(hi === lo, lit(0)).otherwise(
                floor((x - lo) * buckets / (hi - lo)).cast("int"))))
              .as("b"))
        }: _*)).as("cb"))
      .filter(col("cb.x").isNotNull)
      .select(col("__side"), col("cb.column").as("column"), col("cb.b").as("b"))
      .groupBy("column", "b")
      .agg(sum(when(col("__side") === "r", 1L).otherwise(0L)).as("nr"),
        sum(when(col("__side") === "c", 1L).otherwise(0L)).as("nc"))
    // the count table is <= k·buckets rows — the per-column window for
    // the share denominators runs over that tiny table, never data
    val w = org.apache.spark.sql.expressions.Window.partitionBy("column")
      .rowsBetween(Long.MinValue, Long.MaxValue)
    // greatest(total, 1): an empty side divides 0/1 instead of erroring
    // under ANSI, and its shares floor to ε like any empty bucket
    val pc = greatest(col("nc") / greatest(sum("nc").over(w), lit(1L)),
      lit(epsilon))
    val pr = greatest(col("nr") / greatest(sum("nr").over(w), lit(1L)),
      lit(epsilon))
    val order = map(cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c), lit(i))
    }: _*)
    counts
      .select(col("column"), col("nr"), col("nc"),
        ((pc - pr) * log(pc / pr)).as("term"))
      .groupBy("column")
      .agg(sum("term").as("psi"), sum("nr").as("n_ref"),
        sum("nc").as("n_cur"))
      .orderBy(order(col("column")))
      .select(col("column"), col("psi"), col("n_ref"), col("n_cur"))
  }

  /** PSI over a CATEGORICAL column — the variant for language mixes,
    * source shares, IVF-cell occupancy (feed it `ivfAssign`'s cell
    * column and it monitors embedding-space drift of a standing
    * similarity index): categories are their own buckets, no
    * range anchoring needed. Same ε-floored share formula and field
    * thresholds as [[psi]]; categories absent from one side floor to ε
    * like any empty bucket (so NEW categories in the current batch
    * raise PSI — exactly the alert wanted). NULL categories count as
    * their own bucket (a drifting null rate is drift). One grouped
    * count per side on the category keyspace; the tag-and-union keeps
    * it to one scan of each input. */
  def psiCategorical(ref: DataFrame, cur: DataFrame, c: String,
                     epsilon: Double = 1e-6): DataFrame = {
    require(epsilon > 0, s"psiCategorical: epsilon must be positive")
    val counts = ref.select(col(c).cast("string").as("category"))
      .withColumn("__side", lit("r"))
      .unionByName(cur.select(col(c).cast("string").as("category"))
        .withColumn("__side", lit("c")))
      .groupBy("category")
      .agg(sum(when(col("__side") === "r", 1L).otherwise(0L)).as("nr"),
        sum(when(col("__side") === "c", 1L).otherwise(0L)).as("nc"))
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val pc = greatest(col("nc") / greatest(sum("nc").over(w), lit(1L)),
      lit(epsilon))
    val pr = greatest(col("nr") / greatest(sum("nr").over(w), lit(1L)),
      lit(epsilon))
    counts
      .select(col("category"), col("nr"), col("nc"),
        ((pc - pr) * log(pc / pr)).as("term"))
      .agg(sum("term").as("psi"), sum("nr").as("n_ref"),
        sum("nc").as("n_cur"), count(lit(1)).as("n_categories"))
      .select(lit(c).as("column"), col("psi"), col("n_ref"),
        col("n_cur"), col("n_categories"))
  }

  /** Jensen–Shannon divergence between two categorical distributions
    * (token vocabularies, event-type mixes, language histograms) — the
    * symmetric, always-finite complement to [[psiCategorical]]: no
    * ε floor needed because each side's zero terms vanish by the
    * 0·ln 0 = 0 convention, and the value is bounded by ln 2.
    *
    *   JS(P‖Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),  m = (p+q)/2
    *
    * Scale shape: one tagged union + ONE grouped count on the category
    * keyspace (corpus-size independent), totals via a frame-bounded
    * window over the count table. Determinism: integral counts, shares
    * divided once, per-term doubles folded in SORTED category order via
    * an IN-ROW ordered fold (aggregate over array_sort(collect_list) —
    * the woeIv discipline; NEVER a running window sum, which DuckDB
    * executes through a reassociating segment tree above a size
    * threshold), AND the ln itself quantized to
    * the 2⁻²⁶ dyadic grid (floor(ln·2²⁶)/2²⁶ — both scalings are exact
    * IEEE power-of-two multiplies, only the floor rounds): Java's
    * Math.log is allowed 1 ulp of error and measurably disagrees with
    * glibc's correctly-rounded log on real inputs (found live:
    * ln(1.0932544676566827) differs in the last bit), so a raw ln can
    * never be hash-compared cross-engine. 2⁻²⁶ ≈ 1.5e-8 is far below
    * any drift-threshold decision. */
  def jsDivergence(a: DataFrame, b: DataFrame, c: String): DataFrame = {
    val counts = a.select(col(c).cast("string").as("category"))
      .withColumn("__side", lit("a"))
      .unionByName(b.select(col(c).cast("string").as("category"))
        .withColumn("__side", lit("b")))
      .groupBy("category")
      .agg(sum(when(col("__side") === "a", 1L).otherwise(0L)).as("na"),
        sum(when(col("__side") === "b", 1L).otherwise(0L)).as("nb"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val p = col("na") / sum("na").over(wAll)
    val q = col("nb") / sum("nb").over(wAll)
    val m = (p + q) / lit(2.0)
    val term =
      when(col("na") > 0, lit(0.5) * (p * Exact.lnq(p / m)))
        .otherwise(lit(0.0)) +
        when(col("nb") > 0, lit(0.5) * (q * Exact.lnq(q / m)))
          .otherwise(lit(0.0))
    // in-row ordered fold for the total — see woeIv for why a running
    // windowed double SUM cannot be hash-replayed against DuckDB (its
    // segment tree reassociates the additions above a size threshold)
    counts
      .select(col("category"), col("na"), col("nb"), term.as("__t"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("category"), col("__t")))),
          lit(0.0), (acc, e) => acc + e.getField("__t")).as("js"),
        sum("na").cast("long").as("n_a"),
        sum("nb").cast("long").as("n_b"),
        count(lit(1)).cast("long").as("n_categories"))
  }

  /** The remaining classical distribution distances in one pass —
    * total variation TV = ½·Σ|p − q| (the "what fraction of mass
    * moved" readout, the tightest bound on any event-probability
    * shift), Bhattacharyya coefficient BC = Σ√(p·q) (overlap ∈
    * [0, 1]) and squared Hellinger H² = 1 − BC (a proper bounded
    * metric where KL/PSI blow up on zeros). Complements
    * [[jsDivergence]] (information-theoretic) and [[psiCategorical]]
    * (ε-floored, industry-conventional): same tagged-union + ONE
    * grouped count shape, category-keyspace state. Determinism:
    * integral counts, shares divided once, |p−q| and √(p·q) are
    * correctly-rounded singles, both totals fold in sorted category
    * order (in-row ordered folds). */
  def distributionDistances(a: DataFrame, b: DataFrame, c: String)
      : DataFrame = {
    val counts = a.select(col(c).cast("string").as("category"))
      .withColumn("__side", lit("a"))
      .unionByName(b.select(col(c).cast("string").as("category"))
        .withColumn("__side", lit("b")))
      .groupBy("category")
      .agg(sum(when(col("__side") === "a", 1L).otherwise(0L)).as("na"),
        sum(when(col("__side") === "b", 1L).otherwise(0L)).as("nb"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val p = col("na") / sum("na").over(wAll)
    val q = col("nb") / sum("nb").over(wAll)
    def fold(t: Column, name: String) =
      aggregate(
        array_sort(collect_list(struct(col("category"), t.as("__t")))),
        lit(0.0), (acc, e) => acc + e.getField("__t")).as(name)
    counts
      .select(col("category"), col("na"), col("nb"),
        abs(p - q).as("__tv"), sqrt(p * q).as("__bc"))
      .agg(fold(col("__tv"), "__tvs"), fold(col("__bc"), "bc"),
        sum("na").cast("long").as("n_a"),
        sum("nb").cast("long").as("n_b"),
        count(lit(1)).cast("long").as("n_categories"))
      .select(col("n_a"), col("n_b"), col("n_categories"),
        (lit(0.5) * col("__tvs")).as("total_variation"),
        col("bc").as("bhattacharyya"),
        (lit(1.0) - col("bc")).as("hellinger_sq"))
  }
}
