package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-projection (Johnson–Lindenstrauss) embedding compression:
  * project a d-dim embedding onto `outDim` pseudo-random ±1 directions,
  * y_j = Σ_i sign(i,j)·x_i. Distances are preserved in expectation
  * (E‖y‖² = outDim·‖x‖² for the unscaled ±1 family), which is what a
  * 100 TB ANN pipeline wants from a cheap first-stage compressor: the
  * projection is a ZERO-shuffle narrow map, and downstream
  * IVF/PQ/LSH tiers ([[Similarity]], [[graft.functions.Pq]]) run on
  * 8 doubles instead of 64 floats.
  *
  * Determinism discipline: the sign matrix is derived from the parity
  * of the first MD5 nibble of "seed_i_j" — a hash family every engine
  * computes identically (the q73b MD5 convention) — and materialized
  * driver-side into a LITERAL outDim×d matrix (outDim·d is tiny and
  * corpus-size independent), so executors never hash. Each y_j folds
  * sequentially in ascending index order via the `aggregate`
  * higher-order function — IEEE addition made order-free by fixing the
  * order — so results are bit-identical on any partitioning and
  * hash-oracle-able (the q159/q175 ordered-fold discipline).
  */
object Projection {

  /** The deterministic ±1 sign for (seed, input dim i, output dim j):
    * parity of the first hex nibble of md5("seed_i_j"). Replayable in
    * any SQL engine as
    * `CAST(CONCAT('0x', SUBSTRING(MD5(...), 1, 1)) AS BIGINT) % 2`. */
  def sign(seed: String, i: Int, j: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val h = md.digest(s"${seed}_${i}_$j".getBytes(StandardCharsets.UTF_8))
    if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
  }

  /** Long-format projection: one row per (id, j) with
    * y = Σ_i sign(i,j)·vec[i]. `dim` is the (fixed) input
    * dimensionality — embedding columns are schema-fixed-width, and a
    * literal sign matrix needs it at plan time. */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, outDim: Int,
                       seed: String = "jl"): DataFrame = {
    require(dim > 0 && outDim > 0, s"bad dims: $dim -> $outDim")
    val comps = (0 until outDim).map { j =>
      val signs = array((0 until dim).map(i => lit(sign(seed, i, j))): _*)
      val terms = zip_with(col(vecCol), signs,
        (x, s) => x.cast("double") * s)
      struct(lit(j.toLong).as("j"),
        aggregate(terms, lit(0.0), (acc, t) => acc + t).as("y"))
    }
    df.select(col(idCol), explode(array(comps: _*)).as("e"))
      .select(col(idCol), col("e.j").as("j"), col("e.y").as("y"))
  }

  /** Array-output form for downstream vector ops (ANN candidate
    * generation): one row per id with the projected vector. Same
    * signs, same ordered fold, no explode. */
  def randomProjectionVec(df: DataFrame, idCol: String, vecCol: String,
                          dim: Int, outDim: Int,
                          seed: String = "jl"): DataFrame = {
    require(dim > 0 && outDim > 0, s"bad dims: $dim -> $outDim")
    val comps = (0 until outDim).map { j =>
      val signs = array((0 until dim).map(i => lit(sign(seed, i, j))): _*)
      aggregate(zip_with(col(vecCol), signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, t) => acc + t)
    }
    df.select(col(idCol), array(comps: _*).as("yv"))
  }
}
