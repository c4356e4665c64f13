package graft

import java.sql.DriverManager

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Cross-engine predicate fuzzing (beyond the declared corpus): generate
  * random boolean trees of comparisons over lineitem's numeric/string
  * columns, run the IDENTICAL SQL on Spark and DuckDB, and require
  * identical counts and sums. Catches dialect drift (comparison semantics,
  * null handling, precedence) that hand-written queries miss. Seeds are
  * fixed — failures reproduce. */
class FuzzSuite extends SparkTestBase {

  private val numericCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val intCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
  private val strCols = Map(
    "l_returnflag" -> Seq("A", "N", "R"),
    "l_linestatus" -> Seq("F", "O"))

  private val cmpOps = Seq("=", "<>", "<", "<=", ">", ">=")

  private def leafGen: Gen[String] = Gen.oneOf(
    for {
      c <- Gen.oneOf(numericCols)
      op <- Gen.oneOf(cmpOps)
      v <- Gen.choose(0.0, 100.0)
    } yield s"$c $op ${"%.4f".format(v)}",
    for {
      c <- Gen.oneOf(intCols)
      op <- Gen.oneOf(cmpOps)
      v <- Gen.choose(0L, 6000L)
    } yield s"$c $op $v",
    for {
      (c, vs) <- Gen.oneOf(strCols.toSeq)
      v <- Gen.oneOf(vs)
      form <- Gen.oneOf(s"$c = '$v'", s"$c <> '$v'",
        s"$c IN ('${vs.head}', '$v')")
    } yield form,
    for {
      c <- Gen.oneOf(numericCols)
      lo <- Gen.choose(0.0, 50.0)
      hi <- Gen.choose(0.0, 60.0)
    } yield s"$c BETWEEN ${"%.4f".format(math.min(lo, hi))} AND ${"%.4f".format(math.max(lo, hi))}")

  private def predGen(depth: Int): Gen[String] =
    if (depth == 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      2 -> (for {
        a <- predGen(depth - 1); b <- predGen(depth - 1)
        op <- Gen.oneOf("AND", "OR")
      } yield s"($a $op $b)"),
      1 -> predGen(depth - 1).map(p => s"(NOT $p)"))

  test("40 random grouped aggregations agree between Spark and DuckDB") {
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("SET TimeZone='UTC'")
      st.execute(
        s"CREATE VIEW lineitem AS SELECT * FROM '$sf0001/lineitem.parquet'")
      val aggFns = Seq(
        (c: String) => s"ROUND(SUM($c), 2)",
        (c: String) => s"ROUND(AVG($c), 4)",
        (c: String) => s"ROUND(MIN($c), 4)",
        (c: String) => s"ROUND(MAX($c), 4)",
        (_: String) => "COUNT(*)")
      val qGen = for {
        keys <- Gen.someOf(Seq("l_returnflag", "l_linestatus", "l_linenumber"))
          .suchThat(_.nonEmpty)
        aggFn <- Gen.oneOf(aggFns)
        aggCol <- Gen.oneOf(numericCols)
        pred <- predGen(2)
        havingN <- Gen.choose(0, 50)
      } yield {
        val ks = keys.mkString(", ")
        s"""SELECT $ks, ${aggFn(aggCol)} a, COUNT(*) n
           |FROM lineitem WHERE $pred
           |GROUP BY $ks HAVING COUNT(*) > $havingN
           |ORDER BY $ks""".stripMargin
      }
      val queries = (1 to 40).flatMap(i =>
        qGen.apply(Gen.Parameters.default, Seed(9000L + i)))
      assert(queries.size >= 30)
      val failures = queries.flatMap { sql =>
        val sr = spark.sql(sql).collect()
          .map(r => (0 until r.length).map(i =>
            Option(r.get(i)).map(_.toString).getOrElse("\\N")).mkString("|"))
        val rs = st.executeQuery(sql)
        val md = rs.getMetaData
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (1 to md.getColumnCount).map(i =>
            Option(r.getObject(i)).map(_.toString).getOrElse("\\N")).mkString("|")
        }.toSeq
        if (sr.toSeq != dr)
          Some(s"sql=${sql.replace('\n', ' ')} spark=${sr.take(2).toSeq} duck=${dr.take(2)}")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("20 random set-operation queries agree between Spark and DuckDB") {
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("SET TimeZone='UTC'")
      for (t <- Seq("lineitem", "orders"))
        st.execute(s"CREATE VIEW $t AS SELECT * FROM '$sf0001/$t.parquet'")
      val qGen = for {
        op <- Gen.oneOf("UNION", "UNION ALL", "INTERSECT", "EXCEPT")
        p <- predGen(2)
        maxPrice <- Gen.choose(10000L, 400000L)
      } yield
        s"""SELECT k, COUNT(*) n FROM (
           |  SELECT l_orderkey k FROM lineitem WHERE $p
           |  $op
           |  SELECT o_orderkey FROM orders WHERE o_totalprice < $maxPrice
           |) t GROUP BY k ORDER BY k""".stripMargin
      val queries = (1 to 20).flatMap(i =>
        qGen.apply(Gen.Parameters.default, Seed(17000L + i)))
      val failures = queries.flatMap { sql =>
        val sr = spark.sql(sql).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val rs = st.executeQuery(sql)
        val dr = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getLong(2))).toSeq
        if (sr != dr) Some(s"sql=${sql.replace('\n', ' ')}") else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("30 random window queries agree between Spark and DuckDB") {
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("SET TimeZone='UTC'")
      st.execute(
        s"CREATE VIEW orders AS SELECT * FROM '$sf0001/orders.parquet'")
      // each entry takes the OVER clause so wrappers like ROUND apply to
      // the whole window expression
      val winFns: Seq[String => String] = Seq(
        over => s"ROW_NUMBER() $over",
        over => s"RANK() $over",
        over => s"DENSE_RANK() $over",
        over => s"COUNT(*) $over",
        over => s"ROUND(SUM(o_totalprice) $over, 2)",
        over => s"LAG(o_orderkey, 1, -1) $over",
        over => s"LEAD(o_orderkey, 1, -1) $over")
      val qGen = for {
        fn <- Gen.oneOf(winFns)
        partition <- Gen.oneOf("o_custkey", "o_orderstatus", "o_orderpriority")
        desc <- Gen.oneOf(true, false)
        maxKey <- Gen.choose(50L, 500L)
        frame <- Gen.oneOf("",
          " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
          " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
          " ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING")
      } yield {
        // total order inside the window (tiebreak o_orderkey) AND in the
        // final output → fully deterministic on both engines. Frames only
        // attach to frameable functions (aggregates).
        val dir = if (desc) "DESC" else "ASC"
        val f = fn("OVER ()")
        val frameable = f.startsWith("COUNT") || f.startsWith("ROUND(SUM")
        val over = s"OVER (PARTITION BY $partition ORDER BY o_totalprice $dir, o_orderkey" +
          (if (frameable) frame else "") + ")"
        s"""SELECT o_orderkey, ${fn(over)} w
           |FROM orders WHERE o_custkey < $maxKey
           |ORDER BY o_orderkey""".stripMargin
      }
      val queries = (1 to 30).flatMap(i =>
        qGen.apply(Gen.Parameters.default, Seed(13000L + i)))
      val failures = queries.flatMap { sql =>
        val sr = spark.sql(sql).collect()
          .map(r => s"${r.get(0)}|${r.get(1)}").toSeq
        val rs = st.executeQuery(sql)
        val dr = Iterator.continually(rs).takeWhile(_.next())
          .map(r => s"${r.getObject(1)}|${r.getObject(2)}").toSeq
        if (sr != dr)
          Some(s"sql=${sql.replace('\n', ' ')}: ${sr.size} vs ${dr.size} rows or diff")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("30 random join queries agree between Spark and DuckDB") {
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("SET TimeZone='UTC'")
      for (t <- Seq("lineitem", "orders"))
        st.execute(s"CREATE VIEW $t AS SELECT * FROM '$sf0001/$t.parquet'")
      val qGen = for {
        jt <- Gen.oneOf("JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN")
        pred <- predGen(2)
        oLimit <- Gen.choose(1000L, 500000L)
      } yield
        s"""SELECT COUNT(*) n,
           |       CAST(COUNT(o.o_orderkey) AS BIGINT) right_nonnull,
           |       CAST(COUNT(l.l_orderkey) AS BIGINT) left_nonnull
           |FROM (SELECT * FROM lineitem WHERE $pred) l
           |$jt (SELECT * FROM orders WHERE o_totalprice < $oLimit) o
           |  ON l.l_orderkey = o.o_orderkey""".stripMargin
      val queries = (1 to 30).flatMap(i =>
        qGen.apply(Gen.Parameters.default, Seed(11000L + i)))
      val failures = queries.flatMap { sql =>
        val sr = spark.sql(sql).collect()(0)
        val rs = st.executeQuery(sql); rs.next()
        val s3 = (sr.getLong(0), sr.getLong(1), sr.getLong(2))
        val d3 = (rs.getLong(1), rs.getLong(2), rs.getLong(3))
        if (s3 != d3) Some(s"sql=${sql.replace('\n', ' ')} spark=$s3 duck=$d3")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("40 random scalar-expression queries agree between Spark and DuckDB") {
    // 6th axis: random compositions from the ANSI-common scalar set
    // (string / integer / conditional) over part — catches function
    // semantics drift (trim charsets, substring bounds, modulo sign,
    // CASE typing) that the fixed corpus queries can't.
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("SET TimeZone='UTC'")
      st.execute(
        s"CREATE VIEW part AS SELECT * FROM '$sf0001/part.parquet'")
      val strCol = Gen.oneOf("p_name", "p_brand", "p_type")
      // string-typed results only — CASE branches must agree on type
      def strOnlyExpr: Gen[String] = Gen.oneOf(
        strCol.map(c => s"UPPER($c)"),
        strCol.map(c => s"LOWER($c)"),
        for { c <- strCol; s <- Gen.choose(1, 5); l <- Gen.choose(1, 8) }
          yield s"SUBSTRING($c, $s, $l)",
        for { a <- strCol; b <- strCol } yield s"CONCAT($a, '_', $b)",
        strCol.map(c => s"TRIM(CONCAT(' ', $c, ' '))"),
        for { c <- strCol; ch <- Gen.oneOf("a", "e", "r") }
          yield s"REPLACE($c, '$ch', '#')")
      def strExpr: Gen[String] = Gen.oneOf(
        strOnlyExpr,
        strCol.map(c => s"CAST(LENGTH($c) AS BIGINT)"))
      def numExpr: Gen[String] = Gen.oneOf(
        Gen.choose(1, 40).map(k => s"ABS(p_size - $k)"),
        Gen.choose(2, 9).map(m => s"MOD(p_size, $m)"),
        Gen.choose(2, 7).map(d => s"CAST(FLOOR(p_size / $d.0) AS BIGINT)"),
        Gen.choose(1, 50).map(k => s"GREATEST(p_size, $k)"),
        Gen.choose(1, 50).map(k => s"LEAST(p_size, $k)"))
      def caseExpr: Gen[String] = for {
        k <- Gen.choose(5, 45); t <- strOnlyExpr; e <- strOnlyExpr
      } yield s"CASE WHEN p_size > $k THEN $t ELSE $e END"
      val qGen = for {
        e1 <- strExpr; e2 <- numExpr; e3 <- caseExpr
        lim <- Gen.choose(40, 120)
      } yield
        s"""SELECT p_partkey, $e1 a, $e2 b, $e3 c
           |FROM part ORDER BY p_partkey LIMIT $lim""".stripMargin
      val queries = (1 to 40).flatMap(i =>
        qGen.apply(Gen.Parameters.default, Seed(21000L + i)))
      assert(queries.size >= 30)
      val failures = queries.flatMap { sql =>
        val sr = spark.sql(sql).collect()
          .map(r => (0 until r.length).map(i =>
            Option(r.get(i)).map(_.toString).getOrElse("\\N")).mkString("|"))
        val rs = st.executeQuery(sql)
        val md = rs.getMetaData
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (1 to md.getColumnCount).map(i =>
            Option(r.getObject(i)).map(_.toString).getOrElse("\\N")).mkString("|")
        }.toSeq
        if (sr.toSeq != dr)
          Some(s"sql=${sql.replace('\n', ' ')} " +
            s"first-diff=${sr.zip(dr).find { case (a, b) => a != b }}")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("40 random LIKE-pattern queries agree between Spark and DuckDB") {
    // 11th axis: random LIKE patterns (wildcards in random positions,
    // literal fragments sampled from the value alphabet, NOT LIKE, and
    // an ESCAPE variant) evaluated per row — pattern-matching semantics
    // are a classic dialect-drift hotspot (% greediness is fine, but
    // '_' vs multibyte, escape handling, and empty-pattern edge cases
    // differ across engines) that the corpus's fixed q04/q04b probes
    // only sample.
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE VIEW part AS SELECT * FROM '$sf0001/part.parquet'")
      val frag = Gen.oneOf("a", "b", "r", "st", "ow", "li", "e", "an")
      val hole = Gen.oneOf("%", "_", "__", "%_")
      def patGen: Gen[String] = for {
        n <- Gen.choose(1, 3)
        parts <- Gen.listOfN(n, for {
          f <- frag; h <- hole
        } yield f + h)
        lead <- Gen.oneOf("", "%")
      } yield lead + parts.mkString
      val exprGen: Gen[String] = Gen.oneOf(
        for { c <- Gen.oneOf("p_name", "p_type"); p <- patGen }
          yield s"$c LIKE '$p'",
        for { c <- Gen.oneOf("p_name", "p_type"); p <- patGen }
          yield s"$c NOT LIKE '$p'",
        // escaped literal underscore/percent: pattern built so the
        // escape character is load-bearing
        for { c <- Gen.oneOf("p_name", "p_brand"); f <- frag }
          yield s"$c LIKE CONCAT('%', '$f', '!_%') ESCAPE '!'")
      val qGen = for {
        e1 <- exprGen; e2 <- exprGen
        lim <- Gen.choose(60, 150)
      } yield
        s"""SELECT p_partkey, $e1 a, $e2 b
           |FROM part ORDER BY p_partkey LIMIT $lim""".stripMargin
      val queries = (1 to 40).flatMap(i =>
        qGen.apply(Gen.Parameters.default, Seed(37000L + i)))
      assert(queries.size >= 30)
      val failures = queries.flatMap { sql =>
        val sr = spark.sql(sql).collect()
          .map(r => (0 until r.length).map(i =>
            Option(r.get(i)).map(_.toString).getOrElse("\\N")).mkString("|"))
        val rs = st.executeQuery(sql)
        val md = rs.getMetaData
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (1 to md.getColumnCount).map(i =>
            Option(r.getObject(i)).map(_.toString).getOrElse("\\N")).mkString("|")
        }.toSeq
        if (sr.toSeq != dr)
          Some(s"sql=${sql.replace('\n', ' ')} " +
            s"first-diff=${sr.zip(dr).find { case (a, b) => a != b }}")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("30 random date-expression queries agree between Spark and DuckDB") {
    // 7th axis: random compositions from the ANSI-common date set over
    // orders — EXTRACT, DATE_TRUNC, LAST_DAY, +INTERVAL, GREATEST/LEAST
    // and CASE over them. Dates are a classic drift area (trunc result
    // types, interval arithmetic, month boundaries); everything is cast
    // to DATE so both engines compare the same lexical form.
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("SET TimeZone='UTC'")
      st.execute(
        s"CREATE VIEW orders AS SELECT * FROM '$sf0001/orders.parquet'")
      val d = "CAST(o_orderdate AS DATE)"
      def dateExpr: Gen[String] = Gen.oneOf(
        Gen.oneOf("month", "quarter", "year")
          .map(u => s"CAST(DATE_TRUNC('$u', $d) AS DATE)"),
        Gen.choose(1, 90).map(k => s"CAST($d + INTERVAL $k DAY AS DATE)"),
        Gen.const(s"LAST_DAY($d)"),
        Gen.oneOf("1996-06-15", "1997-01-01", "1998-03-31")
          .map(lit => s"GREATEST($d, DATE '$lit')"),
        Gen.oneOf("1996-06-15", "1997-12-01")
          .map(lit => s"LEAST($d, DATE '$lit')"))
      def numExpr: Gen[String] = Gen.oneOf(
        Gen.oneOf("YEAR", "MONTH", "DAY")
          .map(f => s"CAST(EXTRACT($f FROM $d) AS BIGINT)"),
        Gen.choose(2, 6)
          .map(m => s"CAST(MOD(EXTRACT(MONTH FROM $d), $m) AS BIGINT)"))
      def caseExpr: Gen[String] = for {
        k <- Gen.choose(2, 11); t <- dateExpr; e <- dateExpr
      } yield s"CASE WHEN EXTRACT(MONTH FROM $d) > $k THEN $t ELSE $e END"
      val qGen = for {
        e1 <- dateExpr; e2 <- numExpr; e3 <- caseExpr
        lim <- Gen.choose(40, 120)
      } yield
        s"""SELECT o_orderkey, $e1 a, $e2 b, $e3 c
           |FROM orders WHERE o_orderkey < 3000
           |ORDER BY o_orderkey LIMIT $lim""".stripMargin
      val queries = (1 to 30).flatMap(i =>
        qGen.apply(Gen.Parameters.default, Seed(33000L + i)))
      assert(queries.size >= 25)
      val failures = queries.flatMap { sql =>
        val sr = spark.sql(sql).collect()
          .map(r => (0 until r.length).map(i =>
            Option(r.get(i)).map(_.toString).getOrElse("\\N")).mkString("|"))
        val rs = st.executeQuery(sql)
        val md = rs.getMetaData
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (1 to md.getColumnCount).map(i =>
            Option(r.getObject(i)).map(_.toString).getOrElse("\\N")).mkString("|")
        }.toSeq
        if (sr.toSeq != dr)
          Some(s"sql=${sql.replace('\n', ' ')} " +
            s"first-diff=${sr.zip(dr).find { case (a, b) => a != b }}")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("80 random predicate trees agree between Spark and DuckDB") {
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("SET TimeZone='UTC'")
      st.execute(
        s"CREATE VIEW lineitem AS SELECT * FROM '$sf0001/lineitem.parquet'")
      val preds = (1 to 80).flatMap(i =>
        predGen(3).apply(Gen.Parameters.default, Seed(7000L + i)))
      assert(preds.size >= 70)
      val failures = preds.flatMap { p =>
        val sql =
          s"""SELECT COUNT(*) n, ROUND(COALESCE(SUM(l_quantity), 0), 2) s
             |FROM lineitem WHERE $p""".stripMargin
        val sr = spark.sql(sql).collect()(0)
        val rs = st.executeQuery(sql)
        rs.next()
        val (sn, ss) = (sr.getLong(0), sr.getDouble(1))
        val (dn, ds) = (rs.getLong(1), rs.getDouble(2))
        if (sn != dn || math.abs(ss - ds) > 1e-6)
          Some(s"pred=$p spark=($sn,$ss) duck=($dn,$ds)")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("12 random chunking geometries agree between Spark and DuckDB") {
    // 8th axis: the q106 window-count/offset formula across the
    // (size, overlap) space, not just the corpus query's 256/64 point.
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE VIEW documents AS SELECT * FROM '$sf0001/documents.parquet'")
      val geomGen = for {
        size <- Gen.choose(8, 400)
        overlap <- Gen.choose(0, size - 1)
      } yield (size, overlap)
      val geoms = (1 to 12).flatMap(i =>
        geomGen.apply(Gen.Parameters.default, Seed(7000L + i)))
      assert(geoms.size >= 10)
      val failures = geoms.flatMap { case (size, overlap) =>
        val stride = size - overlap
        val sr = ops.Chunking.charChunks(
            Tables.table(spark, sf0001, "documents"), "doc_id", "text",
            size, overlap)
          .orderBy("doc_id", "chunk_seq")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getString(4)))
          .toSeq
        val rs = st.executeQuery(
          s"""WITH n AS (
             |  SELECT doc_id, text, LENGTH(text) len,
             |         GREATEST(1, (LENGTH(text) - $overlap + ${stride - 1}) // $stride) nc
             |  FROM documents),
             |c AS (SELECT doc_id, text, len, UNNEST(RANGE(0, nc)) ci FROM n)
             |SELECT doc_id, ci, ci * $stride,
             |  LEAST($size, len - ci * $stride),
             |  SUBSTRING(text, CAST(ci * $stride + 1 AS INT), $size)
             |FROM c ORDER BY doc_id, ci""".stripMargin)
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getString(5))
        }.toSeq
        if (sr != dr)
          Some(s"size=$size overlap=$overlap spark=${sr.size} rows " +
            s"duck=${dr.size} rows; first diff: " +
            sr.zip(dr).find { case (a, b) => a != b }.orElse(
              Some((sr.drop(dr.size).headOption, dr.drop(sr.size).headOption))))
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("12 random z-order geometries agree between Spark and DuckDB") {
    // 10th axis: Layout.withZ across random bit widths and column
    // pairs — the exact-integer rank scaling and the full interleave,
    // not just the corpus query's (partkey, suppkey, 8-bit) point.
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE VIEW lineitem AS SELECT * FROM '$sf0001/lineitem.parquet'")
      val colsPool = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      val geomGen = for {
        bits <- Gen.choose(2, 12)
        cx <- Gen.oneOf(colsPool)
        cy <- Gen.oneOf(colsPool.filterNot(_ == cx))
      } yield (bits, cx, cy)
      val geoms = (1 to 12).flatMap(i =>
        geomGen.apply(Gen.Parameters.default, Seed(9900L + i)))
      assert(geoms.size >= 10)
      val failures = geoms.flatMap { case (bits, cx, cy) =>
        val sr = graft.ops.Layout.withZ(
            Tables.table(spark, sf0001, "lineitem")
              .filter(org.apache.spark.sql.functions.col("l_orderkey") < 400),
            cx, cy, bits)
          .select("l_orderkey", "l_linenumber", "z")
          .orderBy("l_orderkey", "l_linenumber")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
        val k = (1L << bits) - 1
        val terms = (0 until bits).flatMap(i => Seq(
          s"(((xi >> $i) & 1) << ${2 * i})",
          s"(((yi >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
        val rs = st.executeQuery(
          s"""WITH src AS (SELECT * FROM lineitem WHERE l_orderkey < 400),
             |b AS (SELECT MIN($cx) xlo, MAX($cx) xhi,
             |             MIN($cy) ylo, MAX($cy) yhi FROM src),
             |s AS (
             |  SELECT l_orderkey, l_linenumber,
             |    (($cx - xlo) * $k) // GREATEST(xhi - xlo, 1) xi,
             |    (($cy - ylo) * $k) // GREATEST(yhi - ylo, 1) yi
             |  FROM src CROSS JOIN b)
             |SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) z
             |FROM s ORDER BY l_orderkey, l_linenumber""".stripMargin)
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (r.getLong(1), r.getInt(2), r.getLong(3))
        }.toSeq
        if (sr != dr)
          Some(s"bits=$bits cx=$cx cy=$cy: spark=${sr.size} duck=${dr.size}; " +
            s"first diff ${sr.zip(dr).find { case (a, b) => a != b }}")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("15 random conformance DDLs agree between Spark and DuckDB") {
    // 9th axis: Schema.conform across random target schemas — column
    // selection, ordering, typed-NULL ghosts, extras dropped, casts.
    // Cast targets are restricted to cross-engine-deterministic pairs:
    // integer sources cast anywhere, strings/doubles stay put (Spark
    // truncates double→int, DuckDB rounds — a REAL dialect divergence
    // this axis must not trip on; the corpus pins the safe forms).
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE VIEW lineitem AS SELECT * FROM '$sf0001/lineitem.parquet'")
      val intSrc = Seq("l_partkey", "l_suppkey", "l_linenumber")
      val strSrc = Seq("l_returnflag", "l_linestatus")
      val dblSrc = Seq("l_quantity", "l_discount")
      val duckType = Map("INT" -> "INTEGER", "BIGINT" -> "BIGINT",
        "DOUBLE" -> "DOUBLE", "STRING" -> "VARCHAR")
      val fieldGen: Gen[(String, String)] = Gen.oneOf(
        for {
          c <- Gen.oneOf(intSrc)
          t <- Gen.oneOf("INT", "BIGINT", "DOUBLE", "STRING")
        } yield (c, t),
        Gen.oneOf(strSrc).map(c => (c, "STRING")),
        Gen.oneOf(dblSrc).map(c => (c, "DOUBLE")),
        for {
          n <- Gen.choose(1, 99)
          t <- Gen.oneOf("INT", "STRING", "DOUBLE")
        } yield (s"ghost_$n", t))
      val schemaGen: Gen[Seq[(String, String)]] = for {
        n <- Gen.choose(2, 5)
        fs <- Gen.listOfN(n, fieldGen)
      } yield (("l_orderkey", "BIGINT") +: ("l_linenumber", "INT") +:
        fs).distinctBy(_._1)
      val schemas = (1 to 15).flatMap(i =>
        schemaGen.apply(Gen.Parameters.default, Seed(9100L + i)))
      assert(schemas.size >= 13)
      val failures = schemas.flatMap { fields =>
        val ddl = fields.map { case (n, t) => s"$n $t" }.mkString(", ")
        val sr = ops.Schema.conform(
            Tables.table(spark, sf0001, "lineitem")
              .filter(org.apache.spark.sql.functions.col("l_orderkey") < 300),
            ddl)
          .orderBy("l_orderkey", "l_linenumber")
          .collect()
          .map(r => (0 until r.length).map(i =>
            if (r.isNullAt(i)) "NULL" else String.valueOf(r.get(i))).mkString("|"))
          .toSeq
        val sel = fields.map { case (n, t) =>
          if (n.startsWith("ghost_")) s"CAST(NULL AS ${duckType(t)}) $n"
          else s"CAST($n AS ${duckType(t)}) $n"
        }.mkString(", ")
        val rs = st.executeQuery(
          s"""SELECT $sel FROM lineitem WHERE l_orderkey < 300
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          fields.indices.map { i =>
            val v = r.getObject(i + 1)
            if (v == null) "NULL" else String.valueOf(v)
          }.mkString("|")
        }.toSeq
        if (sr != dr)
          Some(s"ddl=[$ddl] spark=${sr.size} duck=${dr.size}; first diff: " +
            sr.zip(dr).find { case (a, b) => a != b })
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("30 random bitwise-expression queries agree between Spark and DuckDB") {
    // 12th axis: bitwise operator trees over the integer key columns,
    // rendered PER DIALECT (Spark spells xor `^` and shifts
    // shiftleft/shiftright; DuckDB spells them xor() and <</>> — and ^
    // means POWER there, so identical-text fuzzing would silently test
    // the wrong operator). Shift amounts are bounded literals over
    // masked operands so neither engine can hit overflow semantics;
    // bit_count operands are masked non-negative for the same reason.
    Tables.register(spark, sf0001)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE VIEW lineitem AS SELECT * FROM '$sf0001/lineitem.parquet'")
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      // (sparkSql, duckSql) pairs of the same expression
      def leaf: Gen[(String, String)] = Gen.oneOf(
        Gen.oneOf(cols).map(c =>
          (s"CAST($c AS BIGINT)", s"CAST($c AS BIGINT)")),
        Gen.choose(0L, 1023L).map(v => (v.toString, v.toString)))
      def node(depth: Int): Gen[(String, String)] =
        if (depth == 0) leaf
        else {
          val sub = node(depth - 1)
          Gen.frequency(
            3 -> (for { (ls, ld) <- sub; (rs, rd) <- sub }
              yield (s"($ls & $rs)", s"($ld & $rd)")),
            3 -> (for { (ls, ld) <- sub; (rs, rd) <- sub }
              yield (s"($ls | $rs)", s"($ld | $rd)")),
            3 -> (for { (ls, ld) <- sub; (rs, rd) <- sub }
              yield (s"($ls ^ $rs)", s"xor($ld, $rd)")),
            1 -> (for { (ls, ld) <- sub; n <- Gen.choose(0, 16) }
              yield (s"SHIFTLEFT(CAST(($ls & 255) AS INT), $n)",
                s"((($ld) & 255) << $n)")),
            1 -> (for { (ls, ld) <- sub; n <- Gen.choose(0, 16) }
              yield (s"SHIFTRIGHT(CAST(($ls & 255) AS INT), $n)",
                s"((($ld) & 255) >> $n)")),
            1 -> sub.map { case (s1, d1) => (s"(~$s1)", s"(~$d1)") },
            1 -> sub.map { case (s1, d1) =>
              (s"CAST(BIT_COUNT($s1 & 1023) AS BIGINT)",
                s"CAST(BIT_COUNT($d1 & 1023) AS BIGINT)") })
        }
      val qGen = for {
        (e1s, e1d) <- node(2); (e2s, e2d) <- node(3)
        lim <- Gen.choose(50, 150)
      } yield (
        // (l_orderkey, l_linenumber) is NOT unique in the fixture, so the
        // projected expressions join the sort key — rows that still tie
        // are bit-identical and LIMIT may pick any of them
        s"SELECT l_orderkey, l_linenumber, $e1s a, $e2s b FROM lineitem " +
          s"ORDER BY l_orderkey, l_linenumber, a, b LIMIT $lim",
        s"SELECT l_orderkey, l_linenumber, $e1d a, $e2d b FROM lineitem " +
          s"ORDER BY l_orderkey, l_linenumber, a, b LIMIT $lim")
      val queries = (1 to 30).flatMap(i =>
        qGen.apply(Gen.Parameters.default, Seed(23000L + i)))
      assert(queries.size >= 25)
      val failures = queries.flatMap { case (sparkSql, duckSql) =>
        val sr = spark.sql(sparkSql).collect().map { r =>
          (0 until r.length).map(i =>
            Option(r.get(i)).map(_.toString).getOrElse("\\N")).mkString("|")
        }.toSeq
        val rs = st.executeQuery(duckSql)
        val md = rs.getMetaData
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (1 to md.getColumnCount).map(i =>
            Option(r.getObject(i)).map(_.toString).getOrElse("\\N")).mkString("|")
        }.toSeq
        if (sr != dr)
          Some(s"spark=[${sparkSql.take(200)}] duck=[${duckSql.take(200)}] " +
            s"first-diff=${sr.zip(dr).find { case (a, b) => a != b }}")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("10 random annJoin geometries agree between Spark and DuckDB") {
    // 12th axis: Similarity.annJoin across random (nlist, nprobe, k) —
    // the q283 oracle replay, not just its one (8, 2, 3) point. The
    // supplied centroids are the first nlist fixture vectors, so cell
    // assignment, probe ranking, candidate cosine and the top-k rank
    // are all exactly replayable; (qid, id, rank, round(sim, 6)) must
    // match row for row.
    import org.apache.spark.sql.functions.{col, round, transform}
    graft.functions.Registry.registerAll(spark)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE VIEW embeddings AS SELECT * FROM '$sf0001/embeddings.parquet'")
      val geomGen = for {
        nlist <- Gen.choose(2, 10)
        nprobe <- Gen.choose(1, nlist)
        k <- Gen.choose(1, 5)
      } yield (nlist, nprobe, k)
      val geoms = (1 to 10).flatMap(i =>
        geomGen.apply(Gen.Parameters.default, Seed(11700L + i)))
      assert(geoms.size >= 8)
      val emb = Tables.table(spark, sf0001, "embeddings")
      val failures = geoms.flatMap { case (nlist, nprobe, k) =>
        val cents = emb.filter(col("vec_id") < nlist)
          .select(col("vec_id").cast("int").as("cell"),
            transform(col("embedding"), _.cast("double")).as("centroid"))
        val sr = graft.ops.Similarity.annJoin(
            emb, emb, "vec_id", "embedding", cents, k = k, nprobe = nprobe)
          .select(col("qid"), col("id"), col("rank").cast("long"),
            round(col("sim"), 6))
          .orderBy("qid", "rank")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSeq
        val rs = st.executeQuery(
          s"""WITH c AS (
             |  SELECT CAST(vec_id AS INTEGER) cell, embedding::DOUBLE[] cv,
             |    LIST_SUM(LIST_TRANSFORM(embedding::DOUBLE[], x -> x*x)) c2
             |  FROM embeddings WHERE vec_id < $nlist),
             |e AS (SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings),
             |d AS (
             |  SELECT e.id, c.cell, e.v,
             |    1 + c.c2 - 2 * SQRT(c.c2)
             |      * COALESCE(LIST_COSINE_SIMILARITY(e.v, c.cv), 0) d2
             |  FROM e CROSS JOIN c),
             |a AS (
             |  SELECT id, cell, v,
             |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cell) rn
             |  FROM d),
             |corp AS (SELECT id, cell, v FROM a WHERE rn = 1),
             |probes AS (SELECT id qid, cell, v qv FROM a WHERE rn <= $nprobe),
             |cand AS (
             |  SELECT p.qid, s.id, LIST_COSINE_SIMILARITY(p.qv, s.v) sim
             |  FROM probes p JOIN corp s ON p.cell = s.cell AND p.qid <> s.id
             |  WHERE LIST_COSINE_SIMILARITY(p.qv, s.v) IS NOT NULL),
             |r AS (
             |  SELECT qid, id, sim,
             |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, id) rk
             |  FROM cand)
             |SELECT qid, id, CAST(rk AS BIGINT) rk, ROUND(sim, 6) sim
             |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin)
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
        }.toSeq
        if (sr != dr)
          Some(s"nlist=$nlist nprobe=$nprobe k=$k: " +
            s"spark=${sr.size} duck=${dr.size}; first diff " +
            s"${sr.zip(dr).find { case (a, b) => a != b }}")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("10 random SRP banding geometries agree between Spark and DuckDB") {
    // 13th axis: Similarity.srpNearDupPairs across random (bandBits,
    // band count, threshold, bucketSplits) — the q286 oracle replay
    // beyond its one (4-bit × 8-band, τ=0.3, auto-salt) point. Planes
    // are the first bands·bandBits FLOOR-quantized fixture vectors
    // (exact integer dots — sign ties impossible), and the salt dial
    // is fuzzed too (0 = auto guard, 1 = off, 3 = forced): the pair
    // set must be salt-invariant AND match the SQL replay row for row.
    import org.apache.spark.sql.functions.{col, floor, round, transform}
    graft.functions.Registry.registerAll(spark)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE VIEW embeddings AS SELECT * FROM '$sf0001/embeddings.parquet'")
      val geomGen = for {
        bandBits <- Gen.choose(2, 8)
        bands <- Gen.choose(4, 10)
        thr <- Gen.oneOf("0.1", "0.2", "0.3", "0.45")
        splits <- Gen.oneOf(0, 1, 3)
      } yield (bandBits, bands, thr, splits)
      val geoms = (1 to 10).flatMap(i =>
        geomGen.apply(Gen.Parameters.default, Seed(13000L + i)))
      assert(geoms.size >= 8)
      val emb = Tables.table(spark, sf0001, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000)).as("vq"))
      val failures = geoms.flatMap { case (bandBits, bands, thr, splits) =>
        val nPlanes = bandBits * bands
        val planes = emb.filter(col("vec_id") < nPlanes)
          .select(col("vec_id").cast("int").as("plane"),
            col("vq").as("vec"))
        val sr = graft.ops.Similarity.srpNearDupPairs(emb, "vec_id",
            "vq", planes, bandBits = bandBits, threshold = thr.toDouble,
            bucketSplits = splits)
          .select(col("a"), col("b"), round(col("sim"), 6))
          .orderBy("a", "b")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        val rs = st.executeQuery(
          s"""WITH e AS (
             |  SELECT vec_id id,
             |    LIST_TRANSFORM(embedding::DOUBLE[],
             |                   x -> CAST(FLOOR(x*1000) AS BIGINT)) v
             |  FROM embeddings),
             |p AS (SELECT CAST(id AS INTEGER) plane, v pv FROM e
             |      WHERE id < $nPlanes),
             |bits AS (
             |  SELECT e.id, p.plane // $bandBits band,
             |    CASE WHEN LIST_DOT_PRODUCT(e.v, p.pv) >= 0
             |      THEN (CAST(1 AS BIGINT) << (p.plane % $bandBits))
             |      ELSE 0 END bv
             |  FROM e CROSS JOIN p),
             |ks AS (SELECT id, band, CAST(SUM(bv) AS BIGINT) k
             |  FROM bits GROUP BY id, band),
             |cand AS (
             |  SELECT DISTINCT x.id a, y.id b FROM ks x
             |  JOIN ks y ON x.band = y.band AND x.k = y.k AND x.id < y.id),
             |pr AS (
             |  SELECT a, b,
             |    LIST_COSINE_SIMILARITY(ea.v::DOUBLE[], eb.v::DOUBLE[]) sim
             |  FROM cand JOIN e ea ON ea.id = cand.a
             |  JOIN e eb ON eb.id = cand.b)
             |SELECT a, b, ROUND(sim, 6) AS sim FROM pr
             |WHERE sim IS NOT NULL AND ROUND(sim, 6) >= $thr
             |ORDER BY a, b""".stripMargin)
        val dr = Iterator.continually(rs).takeWhile(_.next()).map { r =>
          (r.getLong(1), r.getLong(2), r.getDouble(3))
        }.toSeq
        if (sr != dr)
          Some(s"bandBits=$bandBits bands=$bands thr=$thr splits=$splits: " +
            s"spark=${sr.size} duck=${dr.size}; first diff " +
            s"${sr.zip(dr).find { case (a, b) => a != b }}")
        else None
      }
      assert(failures.isEmpty, failures.take(3).mkString("\n"))
    } finally conn.close()
  }

  test("10 random Wilcoxon pairing geometries agree between Spark and DuckDB") {
    // 14th axis: Stats.wilcoxonSignedRank across random (condition
    // type, value scale, pairing-key modulus) — the q292 oracle replay
    // beyond its one point. The key modulus changes how many keys
    // collapse onto each pair (and so the TIE density of the |d|
    // table, the doubled-rank machinery's hard part); the value scale
    // changes how many diffs are exactly zero and drop.
    import org.apache.spark.sql.functions.{col, floor}
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE VIEW events AS SELECT * FROM '$sf0001/events.parquet'")
      val types = Tables.events(spark, sf0001)
        .select("event_type").distinct().collect()
        .map(_.getString(0)).sorted.toSeq
      val geomGen = for {
        t <- Gen.oneOf(types)
        scale <- Gen.oneOf(1, 10, 100)
        keyMod <- Gen.oneOf(25L, 50L, 200L, 1000L)
      } yield (t, scale, keyMod)
      val geoms = (1 to 10).flatMap(i =>
        geomGen.apply(Gen.Parameters.default, Seed(14000L + i)))
      assert(geoms.size >= 8)
      val failures = geoms.flatMap { case (t, scale, keyMod) =>
        val ev = Tables.events(spark, sf0001)
          .withColumn("pk", col("user_id") % keyMod)
        val r = graft.ops.Stats.wilcoxonSignedRank(ev, "pk",
            col("event_type") === t,
            floor(col("value") * scale).cast("long"))
          .collect()(0)
        val sparkRow = (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
        val rs = st.executeQuery(
          s"""WITH k AS (SELECT user_id % $keyMod pk,
             |    CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0
             |      END) AS BIGINT) n1,
             |    CAST(SUM(CASE WHEN event_type = '$t'
             |      THEN CAST(FLOOR(value * $scale) AS BIGINT) ELSE 0
             |      END) AS BIGINT) s1,
             |    CAST(SUM(CASE WHEN event_type <> '$t' THEN 1 ELSE 0
             |      END) AS BIGINT) n2,
             |    CAST(SUM(CASE WHEN event_type <> '$t'
             |      THEN CAST(FLOOR(value * $scale) AS BIGINT) ELSE 0
             |      END) AS BIGINT) s2
             |  FROM events GROUP BY 1),
             |dd AS (SELECT CAST(s1 AS DOUBLE) / n1
             |    - CAST(s2 AS DOUBLE) / n2 d
             |  FROM k WHERE n1 > 0 AND n2 > 0),
             |cells AS (SELECT ABS(d) a, d > 0 p,
             |    CAST(COUNT(*) AS BIGINT) cp
             |  FROM dd WHERE d <> 0 GROUP BY 1, 2),
             |byv AS (SELECT a v, CAST(SUM(cp) AS BIGINT) c
             |  FROM cells GROUP BY 1),
             |rk AS (SELECT v, c,
             |    CAST(2 * COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
             |      AS BIGINT) dr
             |  FROM byv),
             |m AS (SELECT CAST(COALESCE(SUM(cp), 0) AS HUGEINT) n,
             |    COALESCE(SUM(CASE WHEN p THEN CAST(cp AS HUGEINT) * dr
             |      ELSE 0 END), 0) w2
             |  FROM cells JOIN rk ON cells.a = rk.v),
             |t AS (SELECT CAST(COALESCE(SUM(c * c * c - c), 0)
             |    AS HUGEINT) ts FROM byv)
             |SELECT CAST(n AS BIGINT) n, CAST(w2 AS DOUBLE) / 2.0 wp,
             |  CASE WHEN n < 1
             |      OR 2 * n * (n + 1) * (2 * n + 1) - ts <= 0 THEN NULL
             |    ELSE CAST(2 * w2 - n * (n + 1) AS DOUBLE)
             |      / (2.0 * SQRT(CAST(2 * n * (n + 1) * (2 * n + 1) - ts
             |          AS DOUBLE) / 12.0)) END z
             |FROM m CROSS JOIN t""".stripMargin)
        rs.next()
        val z = rs.getDouble(3)
        val zNull = rs.wasNull() // must read IMMEDIATELY after getDouble(3)
        val duckRow = (rs.getLong(1), rs.getDouble(2),
          if (zNull) None else Some(z))
        if (sparkRow != duckRow)
          Some(s"type=$t scale=$scale mod=$keyMod: " +
            s"spark=$sparkRow duck=$duckRow")
        else None
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally conn.close()
  }
}
