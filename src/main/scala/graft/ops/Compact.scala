package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  final case class DeleteReport(
      filesTotal: Long, filesRewritten: Long, rowsDeleted: Long,
      rowsRemaining: Long)

  /** Targeted hard delete — the right-to-be-forgotten / compliance pass
    * on a plain-parquet table: remove every row whose `keyCol` is in
    * `keys`, REWRITING ONLY THE FILES THAT CONTAIN A HIT. At 100 TB a
    * full-table rewrite for a handful of subjects is the difference
    * between minutes and a day: the hit scan is one semi-join reading
    * only `keyCol` + `input_file_name()` (column-pruned), untouched
    * files are never read again, and the affected files' survivors are
    * rewritten through the same two-rename crash-safe swap discipline
    * as [[compactDir]] (tmp dir → move affected originals aside →
    * move rewrites in → drop originals; a crash mid-swap leaves either
    * the originals or the completed state, never both halves).
    *
    * Driver state: the affected FILE LIST (bounded by file count, not
    * data). Deletes are idempotent — re-running with the same keys
    * rewrites nothing. NOT concurrency-safe against same-dir writers
    * (the compaction contract). */
  def deleteKeys(spark: SparkSession, dir: String, keyCol: String,
                 keys: DataFrame): DeleteReport = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, s".${p.getName}__del_tmp")
    val aside = new Path(p.getParent, s".${p.getName}__del_old")
    recoverDelete(fs, p, tmp, aside)
    val keySet = keys.select(col(keys.columns.head).as(keyCol)).distinct()
    val (nFiles, _) = stats(spark, dir)
    val withFile = spark.read.parquet(dir)
      .withColumn("__file", org.apache.spark.sql.functions.input_file_name())
    val affected = withFile.select(col(keyCol), col("__file"))
      .join(keySet, Seq(keyCol), "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0)).sorted
    if (affected.isEmpty)
      return DeleteReport(nFiles, 0L, 0L, spark.read.parquet(dir).count())
    val hit = spark.read.parquet(affected: _*)
    val hitRows = hit.count()
    val survivors = hit.join(keySet, Seq(keyCol), "left_anti")
    // phase 1: rewrites land in tmp BEFORE anything moves
    if (fs.exists(tmp)) fs.delete(tmp, true)
    survivors.write.mode("overwrite").parquet(tmp.toString)
    val kept = survivors.count()
    // phase 2: manifest into tmp FIRST (a crash here leaves only a
    // discardable tmp), then the aside marker — once aside exists, a
    // crash anywhere is completed (not undone) by recoverDelete
    writeManifest(fs, tmp, affected)
    fs.mkdirs(aside)
    affected.foreach { f =>
      val src = new Path(new java.net.URI(f))
      require(fs.rename(src, new Path(aside, src.getName)),
        s"deleteKeys: could not move $src aside")
    }
    installDelete(fs, p, tmp, aside)
    DeleteReport(nFiles, affected.length.toLong, hitRows - kept,
      spark.read.parquet(dir).count())
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            into: Path, files: Seq[String]): Unit = {
    val out = fs.create(new Path(into, "_manifest"), true)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  /** Move tmp's parquet files into the live dir, then drop aside+tmp —
    * the final step of a delete, also used to COMPLETE a crashed one. */
  private def installDelete(fs: org.apache.hadoop.fs.FileSystem,
                            p: Path, tmp: Path, aside: Path): Unit = {
    fs.listStatus(tmp).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (s0, i) =>
        val dst = new Path(p, s"part-del-${s0.getPath.getName}")
        require(fs.rename(s0.getPath, dst), s"deleteKeys: install $dst")
      }
    fs.delete(aside, true)
    fs.delete(tmp, true)
  }

  /** Crash recovery: an aside dir means a previous delete had already
    * written its complete rewrites to tmp (write order guarantees it)
    * — finish displacing any manifest-listed file still live, then
    * install. A tmp without an aside is a pre-swap crash: discard. */
  private def recoverDelete(fs: org.apache.hadoop.fs.FileSystem,
                            p: Path, tmp: Path, aside: Path): Unit = {
    if (fs.exists(aside)) {
      if (fs.exists(tmp)) {
        val mf = new Path(tmp, "_manifest")
        if (fs.exists(mf)) {
          val in = fs.open(mf)
          val text = try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString finally in.close()
          text.split("\n").filter(_.nonEmpty).foreach { f =>
            val src = new Path(new java.net.URI(f))
            if (fs.exists(src))
              require(fs.rename(src, new Path(aside, src.getName)),
                s"deleteKeys recovery: could not move $src aside")
          }
        }
        installDelete(fs, p, tmp, aside)
      } else fs.delete(aside, true) // install finished; cleanup missed
    } else if (fs.exists(tmp)) fs.delete(tmp, true)
  }
}
