package graft

import org.apache.spark.sql.SparkSession

/** Session factory (SURVEY.md §7.1): one place that pins every
  * determinism- and scale-relevant config the engine depends on:
  *
  *  - UTC session timezone (cross-engine timestamp agreement, §1.2)
  *  - `nanosAsLong` legacy flag (the events fixture is ns-precision
  *    parquet that Spark 4 otherwise refuses to read)
  *  - AQE on (runtime join re-selection, partition coalescing, skew split)
  *  - custom expressions injected via [[GraftExtensions]] so pure-SQL
  *    users see `cosine_similarity`/`shingles`/`winnow`; the `geomean`
  *    UDAF is registered on top (no extensions hook for Aggregators)
  *
  * `shufflePartitions` should be ≈ cores locally; on a real cluster leave
  * it high and let AQE coalesce (DESIGN.md "Config posture").
  */
object EtlSession {

  def create(master: String = "local[*]",
             shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
             appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    functions.Registry.registerAll(spark) // geomean + idempotent re-adds
    spark
  }
}
