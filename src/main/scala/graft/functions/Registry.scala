package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Registers the engine's custom SQL functions on a session (idempotent). */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    fr.createOrReplaceTempFunction(
      "shingles", exprs => Shingles(exprs(0), exprs(1)), "scala_udf")
    fr.createOrReplaceTempFunction(
      "winnow", exprs => Winnow(exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.udf.register("geomean", F.udaf(GeoMean))
  }
}
