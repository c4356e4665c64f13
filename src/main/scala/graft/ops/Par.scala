package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism for CPU-heavy map work (r16 optimization,
  * guide §2.5/§6).
  *
  * The local fixture tables are single small parquet files, so a scan is
  * ONE task — and Spark runs map-side work (tokenizing, shingling, 17-way
  * hashing, regex) inside the scan stage, serializing it on one core no
  * matter how many slots the session has. On a real 100 TB corpus the scan
  * arrives in thousands of splits and this helper is a structural no-op.
  *
  * [[widen]] therefore repartitions ONLY when the plan's current
  * parallelism is below the session default — the condition is evaluated
  * per-plan, not hard-coded to any core count, so the same code is optimal
  * both locally and on a cluster (where the input is already wide and no
  * shuffle is added).
  */
object Par {

  /** Hash-spread `df` across the session's default parallelism before
    * CPU-heavy per-row work, if (and only if) its plan currently has
    * fewer partitions than that. `by` should be a well-distributed key
    * (a document id); hash repartition is used rather than round-robin
    * to avoid the sort-before-repartition pass and keep the placement
    * deterministic under task retry (guide §2.5).
    *
    * HAZARD (ADVICE r16): the partition-count probe goes through
    * `df.rdd`, which under AQE forces `getFinalPhysicalPlan` — if `df`
    * contains un-materialized SHUFFLE stages they execute eagerly in a
    * throwaway QueryExecution whose work the real action does not
    * reuse, and on a STREAMING DataFrame `.rdd` throws AnalysisException
    * outright. Call widen() only on scan-level / cached /
    * already-materialized inputs (every current call site: raw parquet
    * scans, cached frames, foreachBatch batches) — not on arbitrary
    * lazily-built frames. */
  def widen(df: DataFrame, by: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, by)
  }
}
