package graft.pipeline.stages

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TransformStage

/** Plugin stage wrapping [[graft.ops.Stats.multinomialGof]] — the
  * mixture-compliance gate as a declarative-pipeline block: after a
  * sampled/raked load lands, does the realized category mix actually
  * match the recipe? Emits the one-row (k, n, chi2) fit so a
  * downstream SQL gate in the same spec can refuse the load when chi2
  * crosses the configured threshold (the BenfordGateStage / T-P11
  * composition pattern). Categories absent from the data still
  * contribute their N·p term, and an observed category the recipe
  * does not know fails the stage loudly — both inherited from the
  * operator.
  *
  * Options (spec `options`): `catCol` — the category column
  * (required); `targets` — comma-separated `category:share` pairs
  * summing to 1 (required), e.g. `"en:0.5,de:0.2,fr:0.3"`. */
class MixtureGateStage extends TransformStage {

  override def apply(spark: SparkSession,
                     inputs: Map[String, DataFrame]): DataFrame = {
    val in = inputs.values.headOption.getOrElse(
      throw new IllegalArgumentException("MixtureGateStage needs one input"))
    val catCol = options.getOrElse("catCol",
      throw new IllegalArgumentException(
        "MixtureGateStage: option 'catCol' required"))
    val targets = options.get("targets")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
        kv.split(":") match {
          case Array(c, p) => (c.trim, p.trim.toDouble)
          case _ => throw new IllegalArgumentException(
            s"MixtureGateStage: bad target '$kv' (want category:share)")
        }
      })
      .getOrElse(throw new IllegalArgumentException(
        "MixtureGateStage: option 'targets' required"))
    graft.ops.Stats.multinomialGof(in, catCol, targets)
  }
}
