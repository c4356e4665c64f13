package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns (SURVEY.md §2.8c L3
  * storage path): a 100 TB float32 embedding store drops to 25 TB with
  * bounded, per-element reconstruction error — the standard first rung of
  * vector compression (below product quantization, above float16).
  *
  * Symmetric per-vector scheme: scale = max|x| / 127,
  * q = clamp(floor(x / scale + 0.5), -127, 127). Floor-plus-half rather
  * than a round() call so the convention is reproducible bit-for-bit on
  * any engine with IEEE doubles (round-half modes differ across engines;
  * floor does not). Everything is codegen'd higher-order functions — a
  * pure projection, no shuffle, no UDF.
  */
object Quantize {

  private def dbl(vecCol: String): Column =
    transform(col(vecCol), _.cast("double"))

  /** Appends `q_scale` (double) and `q_vec` (array<tinyint>). Zero
    * vectors quantize to all-zero with scale 0. */
  def quantizeInt8(emb: DataFrame, vecCol: String): DataFrame = {
    val scale = aggregate(transform(dbl(vecCol), abs(_)), lit(0.0),
      (a, x) => greatest(a, x)) / lit(127.0)
    emb.withColumn("q_scale", scale)
      .withColumn("q_vec",
        when(col("q_scale") === 0.0,
          transform(dbl(vecCol), _ => lit(0).cast("tinyint")))
        .otherwise(transform(dbl(vecCol), x =>
          greatest(lit(-127.0), least(lit(127.0),
            floor(x / col("q_scale") + lit(0.5)))).cast("tinyint"))))
  }

  /** Reconstruct a float vector from (q_scale, q_vec). Per-element error
    * is bounded by q_scale / 2 (asserted in the test suite). */
  def dequantizeFloat(quantized: DataFrame, outCol: String): DataFrame =
    quantized.withColumn(outCol,
      transform(col("q_vec"), q =>
        (q.cast("double") * col("q_scale")).cast("float")))
}
