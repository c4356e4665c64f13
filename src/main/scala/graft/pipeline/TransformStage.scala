package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable transform step — the engine's equivalent of the reference
  * framework's custom-transformation-class surface (SURVEY.md §2.8b U4).
  *
  * Implementations are instantiated by class name from the pipeline spec
  * (`TransformSpec.className`) and receive the views named in
  * `TransformSpec.inputs` as DataFrames. They must return a DataFrame built
  * from Spark transformations (no collect) so the stage stays inside the
  * lazy plan and Catalyst can optimize across stage boundaries.
  */
trait TransformStage {
  private var opts: Map[String, String] = Map.empty

  /** Spec-supplied configuration (`TransformSpec.options`) — available
    * to the stage body; empty when the spec carries none. */
  protected def options: Map[String, String] = opts

  private[pipeline] def withOptions(o: Map[String, String]): this.type = {
    opts = o; this
  }

  def apply(spark: SparkSession, inputs: Map[String, DataFrame]): DataFrame
}
