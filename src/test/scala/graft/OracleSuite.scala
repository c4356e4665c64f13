package graft

import java.sql.{Connection, DriverManager, ResultSet}

import graft.queries.Q

/** Cross-engine correctness: every corpus query with a declared oracle runs
  * on Spark AND on in-JVM DuckDB (JDBC) over the same sf0.001 parquet
  * fixtures; results must match cell-for-cell after canonical serialization
  * (SURVEY.md §5.3). This is the local mirror of the driver's t2 gate
  * (which runs the same comparison at sf0.01 via tools/check.py).
  *
  * Columns are sorted by name before comparison — the driver's compare does
  * the same, which is why every computed column is aliased identically on
  * both engines.
  */
class OracleSuite extends SparkTestBase {

  private def withDuck[T](sfDir: String)(f: Connection => T): T = {
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("SET TimeZone='UTC'")
      Tables.all.foreach { t =>
        st.execute(
          s"CREATE VIEW $t AS SELECT * FROM '$sfDir/$t.parquet'")
      }
      st.close()
      f(conn)
    } finally conn.close()
  }

  /** Canonical cell serialization (SURVEY.md §5.3) applied to both engines. */
  private def canon(v: Any): String = v match {
    case null => "\\N"
    case b: Boolean => if (b) "true" else "false"
    // NO -0 normalization: the driver's hash distinguishes "-0.0" from
    // "0.0" (measured r10 — q156's only divergence), so this mirror must
    // too; queries normalize in-query via `+ 0.0` on BOTH engines.
    case d: Double =>
      if (d.isNaN) "NaN"
      else if (d == 0.0 && 1.0 / d < 0) "-0"
      else BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    case f: Float => canon(f.toDouble)
    case bd: java.math.BigDecimal => bd.stripTrailingZeros.toPlainString
    case bd: BigDecimal => canon(bd.bigDecimal)
    case bi: java.math.BigInteger => bi.toString
    case n: Number => n.toString
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case t: java.sql.Timestamp =>
      t.toLocalDateTime.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    case t: java.time.LocalDateTime =>
      t.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    case a: java.sql.Array =>
      a.getArray.asInstanceOf[Array[AnyRef]].map(canon).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case a: Array[_] => a.map(x => canon(x)).mkString("[", ",", "]")
    case other => other.toString
  }

  private def sparkResult(name: String, sfDir: String): (Seq[String], Seq[Seq[String]]) = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns.toSeq
    val order = cols.indices.sortBy(cols(_))
    (order.map(cols(_)),
      df.collect().toSeq.map(r => order.map(i => canon(r.get(i)))))
  }

  private def duckResult(conn: Connection, sql: String): (Seq[String], Seq[Seq[String]]) = {
    val rs: ResultSet = conn.createStatement().executeQuery(sql)
    val md = rs.getMetaData
    val cols = (1 to md.getColumnCount).map(md.getColumnLabel)
    val order = cols.indices.sortBy(cols(_))
    val rows = Iterator.continually(rs).takeWhile(_.next()).map { r =>
      order.map(i => canon(r.getObject(i + 1)))
    }.toSeq
    (order.map(cols(_)), rows)
  }

  test("all oracle queries hash-match DuckDB at sf0.001") {
    val failures = withDuck(sf0001) { conn =>
      SparkEntry.corpus.flatMap {
        case Q(name, _, Some(oracle)) =>
          try {
            val (sc, sr) = sparkResult(name, sf0001)
            val (dc, dr) = duckResult(conn, oracle)
            if (sc.map(_.toLowerCase) != dc.map(_.toLowerCase))
              Some(s"$name: column mismatch spark=$sc duck=$dc")
            else if (sr != dr) {
              val firstDiff = sr.zip(dr).zipWithIndex
                .find { case ((a, b), _) => a != b }
                .map { case ((a, b), i) => s"row $i: spark=$a duck=$b" }
                .getOrElse(s"row counts ${sr.size} vs ${dr.size}")
              Some(s"$name: $firstDiff")
            } else None
          } catch {
            case e: Exception => Some(s"$name: EXCEPTION ${e.getMessage}")
          }
        case _ => None
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q53 typed array equivalence (ARRAY column kept under test in-suite)") {
    // The corpus q53 serializes the list to CSV so the driver's pandas
    // harness can hash it; the typed ARRAY form stays verified here, where
    // canon() knows how to compare Spark Seq vs DuckDB java.sql.Array.
    Tables.register(spark, sf0001)
    val sparkTyped = spark.sql(
      """SELECT l_orderkey, ARRAY_SORT(COLLECT_LIST(l_linenumber)) lines
        |FROM lineitem WHERE l_orderkey < 30 GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
    val sr = sparkTyped.collect().toSeq.map(r => Seq(canon(r.get(0)), canon(r.get(1))))
    val dr = withDuck(sf0001) { conn =>
      duckResult(conn,
        """SELECT l_orderkey, LIST_SORT(LIST(l_linenumber)) lines
          |FROM lineitem WHERE l_orderkey < 30 GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)._2
    }
    assert(sr == dr)
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and rows-only queries return rows") {
    SparkEntry.corpus.filter(_.oracle.isEmpty).foreach { q =>
      assert(q.fn(spark, sf0001).count() >= 0, q.name)
    }
  }
}
