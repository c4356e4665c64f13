package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance operator every
  * long-running parquet landing zone needs. Streaming sinks and
  * per-batch-id landing layouts (the dedup/upsert runners here) produce
  * many small files; scan cost at 100 TB is dominated by file-open
  * overhead once files fall well below the HDFS-block / row-group
  * sweet spot, and the fix is a periodic rewrite into ~target-sized
  * files.
  *
  * The rewrite is one read + one write: partition count =
  * ceil(bytes / targetBytes), `repartitionByRange` on an optional sort
  * column (keeps min/max file statistics tight for data-skipping —
  * zone-map pruning works when files hold disjoint key ranges) or a
  * plain round-robin `repartition` otherwise. The swap goes through a
  * sibling temp directory plus two renames, so a crash leaves either
  * the old directory or the fully-written new one, never a mix.
  */
object Compact {

  final case class CompactReport(
      filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, bytesAfter: Long, rows: Long)

  private def stats(spark: SparkSession, dir: String): (Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length.toLong, files.map(_.getLen).sum)
  }

  /** Rewrite the parquet directory `dir` into ~`targetBytes` files.
    * Returns the before/after report. NOT concurrency-safe against
    * writers of the same directory (standard for compaction jobs —
    * schedule it in the maintenance window or on a quiesced partition). */
  def compactDir(spark: SparkSession, dir: String,
                 targetBytes: Long = 128L << 20,
                 sortCol: Option[String] = None): CompactReport = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val (nBefore, bytesBefore) = stats(spark, dir)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nParts = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
    val repartitioned = sortCol match {
      case Some(c) => df.repartitionByRange(nParts, col(c))
      case None    => df.repartition(nParts)
    }
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, s".${p.getName}__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    repartitioned.write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(p.getParent, s".${p.getName}__compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(p, old), s"compactDir: could not move $p aside")
    require(fs.rename(tmp, p), s"compactDir: could not install $tmp")
    fs.delete(old, true)
    val (nAfter, bytesAfter) = stats(spark, dir)
    CompactReport(nBefore, bytesBefore, nAfter, bytesAfter, rows)
  }
}
