package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TransformStage

/** Plugin stage wrapping
  * [[graft.ops.Dedup.boilerplateNgramRemoval]] — cross-document
  * repeated n-gram span removal as a declarative-pipeline building
  * block: templates, disclaimers, and navigation fragments that repeat
  * across `minDf`+ documents are excised before downstream scoring
  * ever sees them (cleaning BEFORE classification, the conventional
  * curation order — boilerplate inflates classifier token counts).
  *
  * Expects one input view with `doc_id`/`text`; returns the full input
  * row set with `text` replaced by the cleaned text plus the
  * `n_tokens`/`n_kept` accounting columns. A standing-corpus feed
  * would induce the boiler set once with
  * [[graft.ops.Dedup.boilerplateNgrams]] and stream batches through
  * [[graft.streaming.Streams.runBoilerplateExcision]]; this stage is
  * the self-contained batch form. */
class BoilerplateExcisionStage extends TransformStage {

  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException(
        "BoilerplateExcisionStage needs one input"))
    val cleaned = graft.ops.Dedup
      .boilerplateNgramRemoval(in, "doc_id", "text", n = 4, minDf = 3)
      .withColumnRenamed("id", "doc_id")
    import org.apache.spark.sql.functions.col
    in.drop("text").join(
      cleaned.select(col("doc_id"), col("n_tokens"), col("n_kept"),
        col("text_clean").as("text")),
      Seq("doc_id"))
  }
}
