package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

/** Batch sink dispatch for the pipeline layer (SURVEY.md §2.1 S2–S9).
  *
  * Formats: parquet (with partitionBy), csv, json, orc, jdbc, table
  * (saveAsTable, supports bucketBy via options), noop (metrics-only).
  *
  * Scale note: `partitionBy` at write time is the layout lever for
  * downstream partition pruning; bucketing (`bucketBy` option on table
  * sinks) pre-shuffles once so later joins on the bucket key are
  * co-located and shuffle-free.
  */
object Sinks {

  def write(df: DataFrame, format: String, path: String,
            mode: String = "overwrite",
            partitionBy: Seq[String] = Nil,
            options: Map[String, String] = Map.empty,
            table: Option[String] = None): Unit = {
    def w: DataFrameWriter[Row] = {
      val base = df.write.mode(mode).options(options)
      if (partitionBy.nonEmpty) base.partitionBy(partitionBy: _*) else base
    }
    format.toLowerCase match {
      case "parquet" => w.parquet(path)
      case "csv"     => w.option("header",
        options.getOrElse("header", "true")).csv(path)
      case "json"    => w.json(path)
      case "orc"     => w.orc(path)
      case "xml"     => w.option("rootTag",
          options.getOrElse("rootTag", "rows"))
        .option("rowTag", options.getOrElse("rowTag", "row"))
        .format("xml").save(path)
      case "jdbc"    =>
        DuckDbDialect.ensureRegistered()
        w.format("jdbc").save()
      case "noop"    => w.format("noop").save()
      case "table"   =>
        val name = table.getOrElse(path)
        val withBuckets = (options.get("bucketBy"), options.get("numBuckets")) match {
          case (Some(cols), Some(n)) =>
            val c = cols.split(",").map(_.trim).toIndexedSeq
            w.bucketBy(n.toInt, c.head, c.tail: _*)
          case _ => w
        }
        withBuckets.saveAsTable(name)
      case "kafka"   => throw new UnsupportedOperationException(
        "kafka sink: connector jar not available offline")
      case other     => throw new IllegalArgumentException(
        s"unknown sink format '$other'")
    }
  }

  /** Repair a swap interrupted by a crash: data only under the hidden
    * `__swap_old` sibling means the second rename never ran — restore
    * it; old + live both present means cleanup never ran — drop the
    * superseded copy. Call before reading a swap-written directory. */
  def recoverSwap(df: DataFrame, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}__swap_old")
    if (fs.exists(old)) {
      if (!fs.exists(p))
        require(fs.rename(old, p),
          s"recoverSwap: could not restore $old from interrupted swap")
      else fs.delete(old, true)
    }
  }

  /** Overwrite `dir` with `df` even when `df`'s plan READS `dir` (the
    * upsert-load shape: merged = existing ∪ updates): materialize into a
    * hidden sibling first, then install with two renames — a plain
    * overwrite would truncate its own input. Same crash discipline as
    * [[graft.ops.Compact.compactDir]]; an interrupted swap is repaired
    * by the next [[recoverSwap]]. */
  def writeParquetSwapped(df: DataFrame, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}__swap_tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}__swap_old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    // a stale __swap_old (caller skipped recoverSwap) would fail the
    // move-aside rename; the live directory is `p`, so it is superseded
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(p))
      require(fs.rename(p, old), s"writeParquetSwapped: could not move $p")
    require(fs.rename(tmp, p), s"writeParquetSwapped: could not install $tmp")
    fs.delete(old, true)
  }
}
