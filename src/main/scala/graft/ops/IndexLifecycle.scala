package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned quantizer lifecycle for the frozen-cell index tiers
  * (VERDICT r13 item 5).
  *
  * Every standing retrieval structure in this engine (IVF cells, PQ
  * codes, SemDeDup cells, the kNN feed's centroid view) freezes its
  * quantizer at build time: frozen centroids are what make incremental
  * appends idempotent and cell ids stable across years of feeds. But a
  * drifted corpus eventually needs a RE-TRAIN — and a naive refit in
  * place would corrupt replay idempotence (every standing assignment
  * would silently disagree with the new quantizer).
  *
  * This object gives re-training the warehouse-landing discipline:
  *
  * {{{
  * <base>/centroids_v<N>/    the v<N> centroid table (cell, centroid)
  * <base>/assign_v<N>/       the v<N> full assignment (id, cell, arr)
  * <base>/v<N>.committed     marker: v<N> is live (atomic create)
  * }}}
  *
  * [[retrain]] trains v+1 centroids on a bounded deterministic driver
  * sample (the [[Similarity.ivfIndex]] discipline — hash-ordered top-k,
  * fixed-seed Lloyd; corpus-size-independent memory), lands the v+1
  * centroid AND assignment tables ALONGSIDE v, and only then creates
  * the v+1 marker. The marker create is the atomic "pointer swap":
  *
  *  - a crash BEFORE the marker leaves readers on v — the v tables are
  *    never touched, so replays against v are bit-identical;
  *  - a re-run of an interrupted retrain recomputes the v+1 tables
  *    (each lands via the crash-repairable
  *    [[graft.sources.Sinks.writeParquetSwapped]]) and commits;
  *  - after the marker, [[resolve]] returns v+1 — new batches assign
  *    against the new quantizer; the old version's tables remain for
  *    audit/rollback until [[prune]].
  *
  * At 100 TB the only corpus-scale work is the one map-only assignment
  * pass per retrain; training is a ≤ `trainSample`-row driver collect,
  * and version resolution is a file-listing, no data read. */
object IndexLifecycle {

  final case class RetrainReport(fromVersion: Option[Int],
                                 toVersion: Int, nlist: Int, rows: Long)

  private def fs(spark: SparkSession, base: String) =
    new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def marker(base: String, v: Int) =
    new org.apache.hadoop.fs.Path(base, s"v$v.committed")

  def centroidsPath(base: String, v: Int) = s"$base/centroids_v$v"
  def assignPath(base: String, v: Int) = s"$base/assign_v$v"

  /** The highest COMMITTED version, or None before the first retrain.
    * Only the marker decides: half-landed v+1 tables without a marker
    * are invisible (the crash-before-commit contract). */
  def currentVersion(spark: SparkSession, base: String): Option[Int] = {
    val f = fs(spark, base)
    val dir = new org.apache.hadoop.fs.Path(base)
    if (!f.exists(dir)) None
    else {
      val vs = f.listStatus(dir).map(_.getPath.getName).collect {
        case n if n.startsWith("v") && n.endsWith(".committed") =>
          n.stripPrefix("v").stripSuffix(".committed").toInt
      }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Resolve the live index: (version, centroids, assignments). */
  def resolve(spark: SparkSession, base: String)
      : (Int, DataFrame, DataFrame) = {
    val v = currentVersion(spark, base).getOrElse(
      throw new IllegalStateException(
        s"IndexLifecycle: no committed version under $base"))
    (v, spark.read.parquet(centroidsPath(base, v)),
      spark.read.parquet(assignPath(base, v)))
  }

  /** Train version current+1 on `emb`, land its centroid + assignment
    * tables alongside the live version, and commit atomically via the
    * marker file. Idempotent under crash-replay: an interrupted run
    * leaves the live version untouched; re-running recomputes and
    * commits the same next version. */
  def retrain(spark: SparkSession, base: String, emb: DataFrame,
              idCol: String, vecCol: String, nlist: Int = 16,
              trainSample: Int = 4096, maxIter: Int = 10): RetrainReport = {
    val from = currentVersion(spark, base)
    val next = from.getOrElse(0) + 1
    val (assigned0, centroids) = Similarity.ivfIndex(
      emb, idCol, vecCol, nlist, trainSample, maxIter)
    val obs = new org.apache.spark.sql.Observation()
    val assigned = assigned0.observe(obs, org.apache.spark.sql.functions
      .count(org.apache.spark.sql.functions.lit(1)).as("rows"))
    // land BOTH tables before the marker — order within the pair does
    // not matter (neither is visible until the marker exists)
    graft.sources.Sinks.writeParquetSwapped(
      centroids, centroidsPath(base, next))
    graft.sources.Sinks.writeParquetSwapped(
      assigned, assignPath(base, next))
    // the atomic commit: an empty marker file (existence is the bit)
    val out = fs(spark, base).create(marker(base, next), true)
    out.close()
    RetrainReport(from, next,
      centroids.count().toInt, // committed nlist (kEff may be < nlist)
      scala.util.Try(obs.get("rows").asInstanceOf[Long]).getOrElse(-1L))
  }

  /** Drop every version strictly below the live one (tables + marker).
    * Keep-forever is the default — prune is an explicit storage call. */
  def prune(spark: SparkSession, base: String): Seq[Int] = {
    val live = currentVersion(spark, base).getOrElse(return Nil)
    val f = fs(spark, base)
    val dir = new org.apache.hadoop.fs.Path(base)
    val old = f.listStatus(dir).map(_.getPath.getName).collect {
      case n if n.startsWith("v") && n.endsWith(".committed") =>
        n.stripPrefix("v").stripSuffix(".committed").toInt
    }.filter(_ < live).sorted.toSeq
    old.foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(centroidsPath(base, v)), true)
      f.delete(new org.apache.hadoop.fs.Path(assignPath(base, v)), true)
      f.delete(marker(base, v), false)
    }
    old
  }
}
