package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TransformStage

/** Plugin stage wrapping [[graft.ops.Classifier.scoreWithMap]] — the
  * linear quality-classifier gate as a declarative-pipeline building
  * block. Referenced by class name from `examples/curation_feed.json`;
  * expects one input view holding a `text` column and appends `score`.
  * The weight vector here is a small demonstration model (real feeds
  * would ship their trained vocabulary the same way — the map-literal
  * path stays a zero-shuffle projection to ~10⁴–10⁵ features, and
  * [[graft.ops.Classifier.scoreWithJoin]] covers anything larger).
  * Downstream SQL owns the keep/reject routing decision. */
class ClassifierGateStage extends TransformStage {

  private val weights = Map(
    "fast" -> 0.75, "spark" -> 1.0, "data" -> 0.375, "scan" -> 0.25,
    "slow" -> -1.25, "dup" -> -2.0, "small" -> -0.5, "merge" -> -0.25)

  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("ClassifierGateStage needs one input"))
    graft.ops.Classifier.scoreWithMap(in, "text", weights, bias = -0.5)
  }
}
