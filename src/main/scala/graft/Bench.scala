package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract).
  *
  * Runs every corpus query against `SPARK_GRAFT_SF_DIR` (default sf0.1) on
  * local[32], shuffle.partitions=32, AQE on — the closest local analogue of
  * the multi-executor target. Each query is fully evaluated through the
  * noop sink (count() would let Catalyst skip projection work). Prints ONE
  * JSON line: {"metric":"total","value":N,"unit":"sec","queries":{...}}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EtlSession.create(s"local[$cpus]", cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (codegen, parquet footers) so per-query times
    // reflect execution, not first-job JVM warmup.
    Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    val results = SparkEntry.corpus.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      (q.name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    // A throwing query must not masquerade as a benchmark result: its name
    // goes in "failed" (ADVICE r1) — an empty list is the all-green marker.
    val failed = results.collect { case (k, _, false) => s""""$k"""" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
