package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric helpers shared by the operators whose
  * results are hash-compared against a DuckDB oracle.
  */
object Exact {

  /** Natural log quantized to the 2⁻²⁶ dyadic grid:
    * floor(ln(x)·2²⁶)/2²⁶. Both scalings are exact IEEE power-of-two
    * multiplies; only the floor rounds — identically on every engine.
    *
    * Why: Java's `Math.log` is permitted 1 ulp of error and measurably
    * disagrees with glibc's correctly-rounded `log` on real inputs
    * (live counterexample while oracling q201:
    * ln(1.0932544676566827) differs in the last bit), so a RAW ln can
    * never be hash-compared cross-engine — any ln-bearing oracle is one
    * fixture regeneration away from a 1-ulp mismatch. A 1-ulp
    * difference only changes the floored value when ln(x)·2²⁶ lands
    * within an ulp of an integer (~1e-9 per evaluation) instead of on
    * every unlucky input. 2⁻²⁶ ≈ 1.5e-8 is far below any scoring or
    * gating decision these operators feed.
    *
    * DuckDB replay: `FLOOR(LN(x) * 67108864.0) / 67108864.0`. */
  def lnq(x: Column): Column =
    floor(log(x) * lit(67108864.0)) / lit(67108864.0)

  /** e^x on the same 2⁻²⁶ grid — the [[lnq]] discipline for the
    * inverse direction (CI bounds, back-transformed effect sizes):
    * Java `Math.exp` is 1-ulp loose against other libms exactly like
    * log, so a raw exp can never be hash-compared. Domain: |x| ≲ 18
    * (exp(x)·2²⁶ must stay below 2⁵³ for the grid to mask the ulp —
    * beyond that a raw-exp ulp survives the floor); effect sizes and
    * CI bounds live well inside it.
    *
    * DuckDB replay: `FLOOR(EXP(x) * 67108864.0) / 67108864.0`. */
  def expq(x: Column): Column =
    floor(exp(x) * lit(67108864.0)) / lit(67108864.0)
}
