package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TransformStage

/** Plugin stage wrapping [[graft.ops.Quality.kAnonymity]] — the
  * pre-release privacy audit as a declarative-pipeline block: emits the
  * equivalence-class table (quasi-identifier values, class size n,
  * l_diversity, `risky` = n < k) so a downstream SQL gate in the same
  * spec can refuse the load while any risky class exists (the
  * BenfordGateStage / T-P11 composition pattern).
  *
  * Options (spec `options`): `quasiCols` — comma-separated
  * quasi-identifier columns (required); `sensitiveCol` — the sensitive
  * column (required); `k` — the anonymity threshold (default 10). */
class KAnonymityGateStage extends TransformStage {

  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("KAnonymityGateStage needs one input"))
    val quasi = options.get("quasiCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "KAnonymityGateStage: option 'quasiCols' required"))
    val sensitive = options.getOrElse("sensitiveCol",
      throw new IllegalArgumentException(
        "KAnonymityGateStage: option 'sensitiveCol' required"))
    val k = options.get("k").map(_.toInt).getOrElse(10)
    graft.ops.Quality.kAnonymity(in, quasi, col(sensitive), k)
  }
}
