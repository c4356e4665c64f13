package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Sources}

/** T-IO1..T-IO6 (SURVEY.md §2.1): source/sink round-trips through the
  * pipeline layer's dispatch. JDBC is contract-tested against DuckDB's own
  * JDBC driver (no MySQL/PG jar offline — SURVEY.md §7.3). */
class IoSuite extends SparkTestBase {

  private def tmp(): String = Files.createTempDirectory("graft-io").toString

  private lazy val sample = {
    val df = Tables.table(spark, sf0001, "nation")
    df.cache(); df.count(); df
  }

  test("T-IO1: CSV round-trip with explicit schema") {
    val out = tmp()
    Sinks.write(sample, "csv", s"$out/nation")
    val ddl = "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    val back = Sources.read(spark, "csv", s"$out/nation", Some(ddl))
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
  }

  test("T-IO2: JSON round-trip (nested struct survives)") {
    val out = tmp()
    val nested = sample.select(col("n_nationkey"),
      struct(col("n_name"), col("n_regionkey")).as("info"))
    Sinks.write(nested, "json", s"$out/nested")
    val back = Sources.read(spark, "json", s"$out/nested")
    assert(back.count() == sample.count())
    assert(back.select("info.n_name").distinct().count() ==
      sample.select("n_name").distinct().count())
  }

  test("T-IO3: ORC round-trip") {
    val out = tmp()
    Sinks.write(sample, "orc", s"$out/nation")
    val back = Sources.read(spark, "orc", s"$out/nation")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
  }

  test("T-IO10: XML round-trip (built-in Spark 4 datasource)") {
    val out = tmp()
    Sinks.write(sample, "xml", s"$out/nation")
    val back = Sources.read(spark, "xml", s"$out/nation")
    // XML infers types on read; compare on a normalized projection
    assert(back.select(col("n_nationkey").cast("long"), col("n_name"))
      .orderBy("n_nationkey").collect().toSeq ==
      sample.select(col("n_nationkey").cast("long"), col("n_name"))
        .orderBy("n_nationkey").collect().toSeq)
    // custom tags honored
    Sinks.write(sample, "xml", s"$out/tagged",
      options = Map("rootTag" -> "nations", "rowTag" -> "nation"))
    val tagged = Sources.read(spark, "xml", s"$out/tagged",
      options = Map("rowTag" -> "nation"))
    assert(tagged.count() == sample.count())
    // and through the declarative pipeline layer
    val spec = s"""{
      "name": "tio10",
      "extracts": [
        {"view": "n", "format": "xml", "path": "$out/nation"}],
      "transforms": [
        {"view": "t", "sql": "SELECT COUNT(*) AS n FROM n"}],
      "loads": [
        {"format": "xml", "path": "$out/count"}]
    }"""
    graft.pipeline.PipelineRunner.runJson(spark, spec)
    assert(Sources.read(spark, "xml", s"$out/count")
      .head().getLong(0) == sample.count())
  }

  test("T-IO11: targeted delete rewrites only files containing hits") {
    import graft.ops.Compact
    val dir = s"${tmp()}/subjects"
    val c = Tables.table(spark, sf0001, "customer")
      .select(col("c_custkey").as("k"), col("c_name"), col("c_acctbal"))
    // five files with disjoint key ranges, appended one at a time
    (0 until 5).foreach { i =>
      c.filter(col("k") % 5 === i).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    def files() = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val before = files()
    assert(before.size == 5)
    // delete every key = 0 mod 10 — hits live ONLY in the (k%5 == 0) file
    val doomed = c.filter(col("k") % 10 === 0).select("k")
    val total = c.count()
    val nDoomed = doomed.count()
    val r = Compact.deleteKeys(spark, dir, "k", doomed)
    assert(r.filesRewritten == 1L, r.toString)
    assert(r.rowsDeleted == nDoomed && r.rowsRemaining == total - nDoomed)
    // the four untouched files are still the original ones
    val after = files()
    assert(before.intersect(after).size == 4, s"$before vs $after")
    // data equals the anti-join
    val want = c.join(doomed, Seq("k"), "left_anti")
      .collect().map(_.toString).sorted.toSeq
    val got = spark.read.parquet(dir)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    // idempotent: same keys again → nothing rewritten
    val r2 = Compact.deleteKeys(spark, dir, "k", doomed)
    assert(r2.filesRewritten == 0L && r2.rowsDeleted == 0L)
    // a stale pre-swap tmp from a "crashed" run is discarded on entry
    val staleTmp = new java.io.File(new java.io.File(dir).getParent,
      ".subjects__del_tmp")
    staleTmp.mkdirs()
    java.nio.file.Files.write(staleTmp.toPath.resolve("junk"),
      "x".getBytes)
    val doomed2 = c.filter(col("k") % 10 === 1).select("k")
    val r3 = Compact.deleteKeys(spark, dir, "k", doomed2)
    assert(r3.rowsDeleted == doomed2.count() && !staleTmp.exists())
    assert(spark.read.parquet(dir).count() ==
      total - nDoomed - doomed2.count())
  }

  test("T-IO4: catalog table write/read (saveAsTable / spark.table)") {
    Sinks.write(sample, "table", "", mode = "overwrite",
      table = Some("t_io4_nation"))
    val back = Sources.read(spark, "table", "t_io4_nation")
    assert(back.count() == sample.count())
    spark.sql("DROP TABLE IF EXISTS t_io4_nation")
  }

  test("T-IO5: JDBC round-trip via DuckDB driver") {
    val db = s"${tmp()}/io5.duckdb"
    val url = s"jdbc:duckdb:$db"
    val opts = Map("url" -> url, "dbtable" -> "nation",
      "driver" -> "org.duckdb.DuckDBDriver")
    Sinks.write(sample, "jdbc", "", options = opts)
    val back = Sources.read(spark, "jdbc", "", options = opts)
    assert(back.orderBy("n_nationkey").collect()
      .map(_.getAs[Number](0).longValue).toSeq ==
      sample.orderBy("n_nationkey").collect()
        .map(_.getAs[Number](0).longValue).toSeq)
  }

  test("values source: inline JSON-lines literal with DDL schema") {
    val df = Sources.read(spark, "values",
      "{\"id\": 1, \"name\": \"ok\"}\n{\"id\": 2, \"name\": \"ko\"}",
      schema = Some("id BIGINT, name STRING"))
    assert(df.schema.map(_.dataType.simpleString) == Seq("bigint", "string"))
    assert(df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "ok"), (2L, "ko")))
  }

  test("S7: kafka source/sink fail with a clear offline message") {
    val e1 = intercept[UnsupportedOperationException] {
      Sources.read(spark, "kafka", "topic")
    }
    assert(e1.getMessage.contains("connector jar not available"))
    val e2 = intercept[UnsupportedOperationException] {
      Sinks.write(sample, "kafka", "topic")
    }
    assert(e2.getMessage.contains("not available offline"))
  }

  test("A10: sort-based aggregation fallback produces identical results") {
    val li = Tables.table(spark, sf0001, "lineitem")
    val viaHash = li.groupBy("l_orderkey")
      .agg(sort_array(collect_list("l_linenumber")).as("lines"))
    assert(viaHash.queryExecution.executedPlan.toString
      .contains("ObjectHashAggregate"))
    val hashRows = viaHash.orderBy("l_orderkey").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")
    try {
      val viaSort = li.groupBy("l_orderkey")
        .agg(sort_array(collect_list("l_linenumber")).as("lines"))
      assert(viaSort.queryExecution.executedPlan.toString
        .contains("SortAggregate"))
      val sortRows = viaSort.orderBy("l_orderkey").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
      assert(sortRows == hashRows)
    } finally spark.conf.set(
      "spark.sql.execution.useObjectHashAggregateExec", "true")
  }

  test("T-IO4b: bucketed tables join without an exchange on the bucket key") {
    val li = Tables.table(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val or = Tables.table(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    Sinks.write(li, "table", "", table = Some("t_li_bucketed"),
      options = Map("bucketBy" -> "l_orderkey", "numBuckets" -> "4"))
    Sinks.write(or, "table", "", table = Some("t_or_bucketed"),
      options = Map("bucketBy" -> "o_orderkey", "numBuckets" -> "4"))
    try {
      // bucketed scans satisfy the join's distribution: no Exchange before
      // the SortMergeJoin — the write-time shuffle is reused.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("t_li_bucketed")
        .join(spark.table("t_or_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), plan.take(1500))
      assert(joined.count() ==
        li.join(or, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS t_or_bucketed")
    }
  }

  test("corrupt JSON records are captured, not fatal (PERMISSIVE mode)") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"id": 1, "v": "ok"}
        |this is not json at all
        |{"id": 2, "v": "also ok"}
        |""".stripMargin.getBytes("UTF-8"))
    val df = Sources.read(spark, "json", s"$dir/data.json",
      schema = Some("id BIGINT, v STRING, _corrupt_record STRING"))
    df.cache() // corrupt-record column requires caching before filtering it
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("id").isNotNull).count() == 2)
    df.unpersist()
  }

  test("T-IO7: parquet schema evolution — mergeSchema unifies drifted parts") {
    import spark.implicits._
    val out = tmp()
    // two batches of the same feed, schema drifted between them (a new
    // column appeared) — the standing-table read must see the union
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$out/t/p1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$out/t/p2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$out/t/p*")
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.select("id", "v", "score")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(9.5))))
  }

  test("T-IO6: partitioned parquet write → partition pruning at read") {
    val out = tmp()
    val li = Tables.table(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    Sinks.write(li, "parquet", s"$out/li", partitionBy = Seq("l_returnflag"))
    val back = Sources.read(spark, "parquet", s"$out/li")
      .filter(col("l_returnflag") === "R")
    // Partition pruning must reach the scan: the R-partition filter appears
    // as a PartitionFilter, so only one directory is read.
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), plan.take(2000))
    val expected = li.filter(col("l_returnflag") === "R").count()
    assert(back.count() == expected && expected > 0)
  }

  test("T-IO8: small-file compaction preserves data, shrinks file count") {
    val docs = Tables.table(spark, sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .resolve("docs").toString
    docs.repartition(20).write.parquet(dir) // the small-files pathology
    val before = docs.collect().map(_.toString).sorted.toSeq
    val report = graft.ops.Compact.compactDir(spark, dir,
      targetBytes = 512L << 20, sortCol = Some("doc_id"))
    assert(report.filesBefore >= 20)
    assert(report.filesAfter == 1, s"expected 1 target-sized file: $report")
    assert(report.rows == before.length)
    // data survives byte-for-byte (as values)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // sortCol produced range-partitioned files → re-compaction is a no-op
    val again = graft.ops.Compact.compactDir(spark, dir,
      targetBytes = 512L << 20, sortCol = Some("doc_id"))
    assert(again.filesBefore == 1 && again.rows == before.length)
  }

  test("T-IO9: dynamic partition overwrite replaces only touched partitions") {
    val nation = Tables.table(spark, sf0001, "nation")
    val dir = tmp() + "/nation_by_region"
    Sinks.write(nation, "parquet", dir, mode = "overwrite",
      partitionBy = Seq("n_regionkey"))
    val before = spark.read.parquet(dir)
    val beforeOther = before.filter(col("n_regionkey") =!= 1).count()
    assert(before.filter(col("n_regionkey") === 1).count() > 0)
    // incremental reload of ONE region through the sink option —
    // static overwrite would wipe the whole table
    val reload = nation.filter(col("n_regionkey") === 1)
      .withColumn("n_name", concat(col("n_name"), lit("_v2")))
    Sinks.write(reload, "parquet", dir, mode = "overwrite",
      partitionBy = Seq("n_regionkey"),
      options = Map("partitionOverwriteMode" -> "dynamic"))
    val after = spark.read.parquet(dir)
    assert(after.filter(col("n_regionkey") =!= 1).count() == beforeOther,
      "untouched partitions must survive the dynamic overwrite")
    val r1 = after.filter(col("n_regionkey") === 1)
    assert(r1.count() > 0 &&
      r1.filter(!col("n_name").endsWith("_v2")).count() == 0,
      "the touched partition must hold only the reloaded rows")
  }

  test("T-IO8b: compaction crash recovery + partitioned-layout rejection") {
    val docs = Tables.table(spark, sf0001, "documents")
    val base = Files.createTempDirectory("graft_compact2")
    val dir = base.resolve("docs").toString
    docs.repartition(4).write.parquet(dir)
    val before = docs.count()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}__compact_old")
    // crash between the two renames: data lives ONLY under __compact_old
    assert(fs.rename(p, old))
    val report = graft.ops.Compact.compactDir(spark, dir,
      targetBytes = 512L << 20)
    assert(report.rows == before, "recovery must restore the moved-aside data")
    assert(spark.read.parquet(dir).count() == before)
    // crash after install, before cleanup: stale __compact_old is deleted
    fs.mkdirs(old)
    val report2 = graft.ops.Compact.compactDir(spark, dir,
      targetBytes = 512L << 20)
    assert(report2.rows == before && !fs.exists(old))
    // partitioned (subdirectory) layouts are rejected, not flattened
    val pdir = base.resolve("bylang").toString
    docs.write.partitionBy("lang").parquet(pdir)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Compact.compactDir(spark, pdir)
    }
    assert(e.getMessage.contains("partition"))
  }
}
