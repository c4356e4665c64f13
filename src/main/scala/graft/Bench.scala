package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract).
  *
  * Runs every corpus query against `SPARK_GRAFT_SF_DIR` (default sf0.1) on
  * local[32], shuffle.partitions=32, AQE on — the closest local analogue of
  * the multi-executor target. Each query is fully evaluated through the
  * noop sink (count() would let Catalyst skip projection work). Prints ONE
  * JSON line: {"metric":"total","value":N,"unit":"sec","queries":{...}} —
  * and ALSO writes the same line to `SPARK_GRAFT_BENCH_OUT` (default
  * `BENCH_local_last.json` in the cwd), because the driver's stdout capture
  * has truncated the tail of long runs (VERDICT r5 nit b): the file is the
  * complete, always-parseable artifact.
  *
  * The `canary_q01_sec` field repeats q01's time (a fixed trivial scan) so
  * a throttled box is detectable from the artifact alone.
  * `SPARK_GRAFT_ONLY=q78,q79` restricts the run for local iteration.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = EtlSession.create(s"local[$cpus]", cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (codegen, parquet footers) so per-query times
    // reflect execution, not first-job JVM warmup.
    Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    val corpus = only match {
      case Some(names) => SparkEntry.corpus.filter(q =>
        names.exists(n => q.name == n || q.name.startsWith(n + "_")))
      case None => SparkEntry.corpus
    }
    val results = corpus.map { q =>
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
    val canary = results.collectFirst { case (k, v, _) if k.startsWith("q01") => v }
    // A restricted run must say so in the artifact itself (ADVICE r6):
    // "only" lists the active SPARK_GRAFT_ONLY filter, null = full corpus.
    val onlyField = only
      .map(_.toSeq.sorted.map(n => s""""$n"""").mkString("[", ",", "]"))
      .getOrElse("null")
    val line =
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec"""" +
        s""","canary_q01_sec":${canary.map("%.3f".format(_)).getOrElse("null")}""" +
        s""","n_queries":${results.size},"only":$onlyField""" +
        s""","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] artifact write to $out failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
