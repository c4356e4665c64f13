package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TransformStage

/** Example shippable plugin stage (SURVEY.md §2.8b U4): lowercases and
  * whitespace-normalizes a text column — the first step of most
  * training-data cleaning feeds. Referenced by class name from
  * `examples/normalize_docs_feed.json`; expects one input view holding a
  * `text` column. Pure column expressions: stays inside codegen, no UDF. */
class NormalizeTextStage extends TransformStage {
  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("NormalizeTextStage needs one input"))
    in.withColumn("text",
      regexp_replace(trim(lower(col("text"))), "\\s+", " "))
  }
}
