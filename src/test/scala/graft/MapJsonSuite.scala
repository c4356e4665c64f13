package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T-M1 (SURVEY.md §2.7 F10) map-function goldens and F8 JSON
  * construction smoke tests — the families the DuckDB oracle can't
  * hash-match (map dialect / JSON formatting divergence), pinned here with
  * golden assertions instead. */
class MapJsonSuite extends SparkTestBase {

  import spark.implicits._

  test("T-M1: map, map_keys, map_values, element_at, str_to_map") {
    val df = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "k", "v")
      .select(col("id"), map(col("k"), col("v")).as("m"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getMap[String, Int](1) == Map("a" -> 10))

    val mk = df.select(map_keys(col("m"))).orderBy(col("map_keys(m)")(0))
      .collect().map(_.getSeq[String](0))
    assert(mk.toSeq == Seq(Seq("a"), Seq("b")))

    val mv = spark.sql(
      """SELECT map_values(map('x', 1, 'y', 2)) v,
        |       element_at(map('x', 1, 'y', 2), 'y') e,
        |       element_at(map('x', 1), 'missing') miss""".stripMargin)
      .collect()(0)
    assert(mv.getSeq[Int](0) == Seq(1, 2))
    assert(mv.getInt(1) == 2)
    assert(mv.isNullAt(2))

    val stm = spark.sql(
      "SELECT str_to_map('a:1,b:2', ',', ':')").collect()(0)
      .getMap[String, String](0)
    assert(stm == Map("a" -> "1", "b" -> "2"))
  }

  test("VARIANT: parse_json / variant_get / try_parse_json smoke (Spark 4)") {
    // Semi-structured VARIANT is part of the Spark 4 surface this engine
    // rides on (SURVEY.md §4 stretch); pin the basic contract so a future
    // events-style feed can adopt it deliberately.
    Tables.register(spark, sf0001)
    val r = spark.sql(
      """SELECT variant_get(parse_json('{"k": 7, "s": "x", "arr": [1,2]}'), '$.k', 'int') k,
        |       variant_get(parse_json('{"k": 7, "s": "x"}'), '$.s', 'string') s,
        |       variant_get(parse_json('[{"a": 5}]'), '$[0].a', 'bigint') a0,
        |       try_parse_json('not json') bad""".stripMargin).collect()(0)
    assert(r.getInt(0) == 7 && r.getString(1) == "x" && r.getLong(2) == 5L)
    assert(r.isNullAt(3))
    // VARIANT round-trips through parquet (the storage our feeds use)
    val tmp = java.nio.file.Files.createTempDirectory("variant").toString
    spark.sql(
      """SELECT event_id, parse_json(props) vp
        |FROM events WHERE user_id < 5""".stripMargin)
      .write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
      .selectExpr("event_id", "variant_get(vp, '$.k', 'int') k")
    assert(back.count() > 0)
    assert(back.filter(col("k").isNotNull).count() > 0)
  }

  test("F8: from_json / to_json / json_tuple round-trips") {
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("s", StringType)))
    val df = Seq("""{"k": 7, "s": "hi"}""").toDF("j")
      .select(from_json(col("j"), schema).as("o"))
    val Row(k: Int, s: String) = df.select("o.k", "o.s").collect()(0)
    assert(k == 7 && s == "hi")

    val back = df.select(to_json(col("o"))).collect()(0).getString(0)
    assert(back == """{"k":7,"s":"hi"}""")

    val jt = spark.sql(
      """SELECT json_tuple('{"a": "1", "b": "x"}', 'a', 'b')""")
      .collect()(0)
    assert(jt.getString(0) == "1" && jt.getString(1) == "x")

    // events fixture props column end-to-end through from_json
    val ev = Tables.table(spark, sf0001, "events")
      .select(from_json(col("props"),
        StructType(Seq(StructField("k", IntegerType)))).as("p"))
      .select("p.k").filter(col("k").isNotNull)
    assert(ev.count() > 0)
  }
}
