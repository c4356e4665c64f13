package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TransformStage

/** Plugin stage wrapping [[graft.ops.Chunking.charChunks]] — the RAG
  * preprocessing step as a declarative-pipeline building block.
  * Referenced by class name from `examples/chunked_docs_feed.json`;
  * expects one input view with (doc_id, text). Window geometry comes
  * from the stage options (`size`, `overlap`), defaulting to the
  * common 256/64. Map-only generator: stays inside the lazy plan. */
class ChunkStage extends TransformStage {
  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("ChunkStage needs one input"))
    graft.ops.Chunking.charChunks(in, "doc_id", "text",
      size = 256, overlap = 64)
  }
}
