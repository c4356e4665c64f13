package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TransformStage

/** Plugin stage wrapping [[graft.ops.Quality.winsorize]] — per-group
  * percentile clipping as a declarative-pipeline building block:
  * fat-tailed numeric columns (lengths, scores, prices) are clipped at
  * their group's [p05, p95] before any mean-based statistic downstream
  * sees them, so one crawl artifact can't move a feed's aggregates.
  *
  * Expects one input view with `source` (the group) and `n_chars` (the
  * value); returns the full input row set plus `n_chars_w` (clipped)
  * and the group's `lo`/`hi` bounds — downstream stages aggregate the
  * winsorized column, auditors read the bounds. */
class WinsorizeStage extends TransformStage {

  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("WinsorizeStage needs one input"))
    graft.ops.Quality.winsorize(in, "source", "n_chars",
      pLo = 0.05, pHi = 0.95)
  }
}
