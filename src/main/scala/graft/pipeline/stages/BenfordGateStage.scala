package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TransformStage

/** Plugin stage wrapping [[graft.ops.Quality.benford]] — the
  * fabricated/corrupt-feed smell test as a declarative-pipeline
  * monitoring block: emits the 9-row leading-digit profile (observed
  * share vs the Benford expectation, plus the global chi²) of the
  * feed's `n_chars` column. A downstream SQL gate in the same spec
  * asserts `chi2` below a threshold before the load lands — the same
  * composition pattern as the quality/drift gates (T-P11).
  *
  * Expects one input view with a positive integral `n_chars`. */
class BenfordGateStage extends TransformStage {

  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("BenfordGateStage needs one input"))
    graft.ops.Quality.benford(in, col("n_chars"))
  }
}
