package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TransformStage

/** Plugin stage wrapping [[graft.ops.TextAnalysis.gopherRules]] — the
  * Gopher-rules corpus gate as a declarative-pipeline building block.
  * Referenced by class name from `examples/quality_gate_feed.json`;
  * expects one input view with (doc_id, text) and returns the input
  * rows with the rule metrics and the composite `keep` verdict
  * attached (downstream SQL decides what to do with rejects —
  * filtering and quarantining are routing decisions the feed owns).
  * The metrics are a pure projection; the join back to the input is
  * on the id and broadcasts/AQE-plans like any dimension join. */
class QualityGateStage extends TransformStage {
  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("QualityGateStage needs one input"))
    in.join(graft.ops.TextAnalysis.gopherRules(in, "doc_id", "text",
      minWords = 55, minStopHits = 1), Seq("doc_id"))
  }
}
