package graft

/** Breadth smoke tests for function families the oracle corpus samples but
  * does not exhaust (SURVEY.md §2.7): the wider array family, string
  * utilities, and the ANSI-safe try_* family (relevant because the engine
  * keeps Spark 4's ANSI mode on — §4.2). Golden values pin semantics. */
class FunctionBreadthSuite extends SparkTestBase {

  private def one(sql: String) = spark.sql(s"SELECT $sql").collect()(0)

  test("array family: distinct/union/intersect/except/flatten/zip/sort/compact") {
    assert(one("array_distinct(array(1,2,2,3,1))").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("array_union(array(1,2), array(2,3))").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("array_intersect(array(1,2,3), array(2,3,4))").getSeq[Int](0) == Seq(2, 3))
    assert(one("array_except(array(1,2,3), array(2))").getSeq[Int](0) == Seq(1, 3))
    assert(one("flatten(array(array(1,2), array(3)))").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("sort_array(array(3,1,2), false)").getSeq[Int](0) == Seq(3, 2, 1))
    assert(one("array_compact(array(1, NULL, 2))").getSeq[Int](0) == Seq(1, 2))
    assert(one("array_position(array('a','b'), 'b')").getLong(0) == 2L)
    assert(one("array_repeat('x', 3)").getSeq[String](0) == Seq("x", "x", "x"))
    assert(one("array_max(array(1,9,3))").getInt(0) == 9)
    assert(one("array_min(array(4,1,3))").getInt(0) == 1)
    val zipped = one("arrays_zip(array(1,2), array('a','b'))").getSeq[org.apache.spark.sql.Row](0)
    assert(zipped.map(r => (r.getInt(0), r.getString(1))) == Seq((1, "a"), (2, "b")))
  }

  test("string utilities: initcap/translate/repeat/format_string/levenshtein/soundex") {
    assert(one("initcap('hello spark world')").getString(0) == "Hello Spark World")
    assert(one("translate('abcab', 'ab', 'xy')").getString(0) == "xycxy")
    assert(one("repeat('ab', 3)").getString(0) == "ababab")
    assert(one("format_string('%s=%d', 'k', 42)").getString(0) == "k=42")
    assert(one("levenshtein('kitten', 'sitting')").getInt(0) == 3)
    assert(one("soundex('Robert')").getString(0) == "R163")
    assert(one("overlay('SparkSQL' PLACING '_' FROM 6)").getString(0) == "Spark_QL")
    assert(one("left('abcdef', 2)").getString(0) == "ab")
    assert(one("right('abcdef', 2)").getString(0) == "ef")
  }

  test("math breadth: bround (half-even), pmod, sign, log10, exp") {
    assert(one("bround(2.5, 0)").getAs[java.math.BigDecimal](0).doubleValue == 2.0)
    assert(one("bround(3.5, 0)").getAs[java.math.BigDecimal](0).doubleValue == 4.0)
    assert(one("pmod(-7, 3)").getInt(0) == 2)   // positive modulus
    assert(one("mod(-7, 3)").getInt(0) == -1)   // vs truncated mod
    assert(one("sign(-42.0)").getDouble(0) == -1.0)
    assert(one("log10(1000.0)").getDouble(0) == 3.0)
    assert(math.abs(one("exp(1.0)").getDouble(0) - math.E) < 1e-12)
  }

  test("ANSI-safe try_* family returns NULL instead of erroring") {
    assert(one("try_cast('not-a-number' AS INT)").isNullAt(0))
    assert(one("try_divide(1, 0)").isNullAt(0))
    assert(one("try_add(2147483647, 1)").isNullAt(0)) // int overflow → NULL
    assert(one("try_to_timestamp('garbage')").isNullAt(0))
    assert(one("try_element_at(array(1,2), 5)").isNullAt(0))
    // and the throwing counterparts really do throw under ANSI
    intercept[Exception] {
      spark.sql("SELECT CAST('nope' AS INT)").collect()
    }
  }
}
