package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TransformStage

/** Declarative wrapper over
  * [[graft.ops.Quality.quantileNormalize]]: calibrate the per-source
  * `n_chars` length score onto the corpus-global distribution, so a
  * downstream gate can apply ONE threshold across sources. Adds `pct`
  * (within-source percentile rank) and `n_chars_qn` (the globally
  * calibrated score); all input columns pass through. */
class QuantileNormalizeStage extends TransformStage {

  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("QuantileNormalizeStage needs one input"))
    graft.ops.Quality.quantileNormalize(in, "source", "n_chars")
  }
}
