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
}
