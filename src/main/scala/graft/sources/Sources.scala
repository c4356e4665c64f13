package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source dispatch for the pipeline layer (SURVEY.md §2.1 S1–S8).
  *
  * Formats: parquet, csv, json, orc, xml (built-in since Spark 4;
  * rowTag defaults to "row"), jdbc, table (catalog), values
  * (inline literal rows for tests/seeds). Kafka is declared but fails with
  * a clear message offline — the connector jar does not ship in this
  * environment; the streaming surface is exercised through file and memory
  * sources instead (SURVEY.md §2.8).
  *
  * Scale note: every file format goes through the DataFrameReader so DSv2
  * pushdown/pruning apply; JDBC reads accept `partitionColumn`/`numPartitions`
  * options untouched, which is how a 1000-executor cluster parallelizes an
  * RDBMS extract.
  */
object Sources {

  def read(spark: SparkSession, format: String, path: String,
           schema: Option[String] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    def reader: DataFrameReader = {
      val r = spark.read.options(options)
      schema.fold(r)(ddl => r.schema(StructType.fromDDL(ddl)))
    }
    format.toLowerCase match {
      case "parquet" => reader.parquet(path)
      case "csv"     => reader.option("header",
        options.getOrElse("header", "true")).csv(path)
      case "json"    => reader.json(path)
      case "orc"     => reader.orc(path)
      case "text"    => reader.text(path)
      case "xml"     => reader.option("rowTag",
        options.getOrElse("rowTag", "row")).format("xml").load(path)
      case "binaryfile" =>
        // raw-media ingestion: (path, modificationTime, length, content)
        // per file; pathGlobFilter narrows to one media kind. The DSv2
        // source splits across executors by file, which is exactly the
        // decode-parallelism a media corpus wants.
        reader.format("binaryFile").load(path)
      case "jdbc"    =>
        DuckDbDialect.ensureRegistered()
        reader.format("jdbc").load()
      case "table"   => spark.table(path)
      case "values"  =>
        // Inline literal source: `path` IS the data — JSON-lines rows
        // (one object per line), with the optional DDL `schema` giving
        // exact types. Backs test/seed feeds without touching disk.
        import spark.implicits._
        reader.json(spark.createDataset(path.split('\n').toSeq))
      case "kafka"   => throw new UnsupportedOperationException(
        "kafka source: connector jar not available in this offline " +
          "environment; use format=parquet/json file streams or MemoryStream " +
          "for the streaming surface")
      case other     => throw new IllegalArgumentException(
        s"unknown source format '$other'")
    }
  }
}
