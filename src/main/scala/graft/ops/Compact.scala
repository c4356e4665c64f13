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
  * sibling temp directory plus two renames. A crash between the two
  * renames leaves the data only under the hidden `.<name>__compact_old`
  * sibling with the real directory absent — the next [[compactDir]] run
  * on the same path detects and repairs that state on entry (renames
  * the old directory back, or deletes it if the install did complete),
  * so the data is never lost and never doubled. Partitioned
  * (subdirectory) layouts are rejected: a flat rewrite would silently
  * collapse the partition columns — compact each leaf partition
  * directory instead.
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
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldDir = new Path(p.getParent, s".${p.getName}__compact_old")
    // Crash recovery (ADVICE r4): a previous run that died between the
    // two renames left the data only under __compact_old with the real
    // directory absent — restore it. If both exist, the previous run
    // crashed after installing the new directory but before cleanup —
    // the leftover is a fully superseded copy, delete it.
    if (fs.exists(oldDir)) {
      if (!fs.exists(p))
        require(fs.rename(oldDir, p),
          s"compactDir: could not restore $oldDir from interrupted run")
      else fs.delete(oldDir, true)
    }
    // Partitioned layouts have their data under key=value subdirectories
    // that stats() cannot see and a flat rewrite would destroy.
    val subdirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
    require(subdirs.isEmpty,
      s"compactDir: $dir has subdirectories (${subdirs.mkString(", ")}) — " +
        "partitioned layout; compact each leaf partition directory instead")
    val (nBefore, bytesBefore) = stats(spark, dir)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nParts = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
    val repartitioned = sortCol match {
      case Some(c) => df.repartitionByRange(nParts, col(c))
      case None    => df.repartition(nParts)
    }
    val tmp = new Path(p.getParent, s".${p.getName}__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    repartitioned.write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(p, oldDir), s"compactDir: could not move $p aside")
    require(fs.rename(tmp, p), s"compactDir: could not install $tmp")
    fs.delete(oldDir, true)
    val (nAfter, bytesAfter) = stats(spark, dir)
    CompactReport(nBefore, bytesBefore, nAfter, bytesAfter, rows)
  }
}
