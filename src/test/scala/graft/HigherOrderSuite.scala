package graft

import java.sql.DriverManager

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §2.7 F9 higher-order array functions (transform / filter /
  * aggregate / zip_with / exists / forall) property-tested against plain
  * Scala references, plus the §5.6 cross-engine ROUND-parity property
  * (Spark vs DuckDB over generated doubles). */
class HigherOrderSuite extends SparkTestBase {

  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1000L + i)))

  private val arrGen: Gen[List[Int]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.choose(-50, 50)))

  test("higher-order functions match Scala references on generated arrays") {
    val arrays = samples(arrGen, 40)
    val df = arrays.zipWithIndex.map { case (a, i) => (i, a) }.toDF("i", "a")
      .selectExpr(
        "i",
        "transform(a, x -> x * 2 + 1) AS t",
        "filter(a, x -> x % 2 = 0) AS f",
        "aggregate(a, 0, (acc, x) -> acc + x) AS agg",
        "zip_with(a, a, (x, y) -> x + y) AS z",
        "exists(a, x -> x > 40) AS ex",
        "forall(a, x -> x > -51) AS fa")
      .collect().map(r => r.getInt(0) -> r).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val r = df(i)
      assert(r.getSeq[Int](1) == a.map(x => x * 2 + 1), s"transform $i")
      assert(r.getSeq[Int](2) == a.filter(x => math.floorMod(x, 2) == 0 || x % 2 == 0), s"filter $i")
      assert(r.getInt(3) == a.sum, s"aggregate $i")
      assert(r.getSeq[Int](4) == a.map(_ * 2), s"zip_with $i")
      assert(r.getBoolean(5) == a.exists(_ > 40), s"exists $i")
      assert(r.getBoolean(6) == a.forall(_ > -51), s"forall $i")
    }
  }

  test("sequence/inline/posexplode generators") {
    assert(spark.sql("SELECT sequence(1, 5)").collect()(0).getSeq[Int](0)
      == Seq(1, 2, 3, 4, 5))
    val inl = spark.sql(
      "SELECT inline(array(struct(1, 'a'), struct(2, 'b')))").collect()
    assert(inl.map(r => (r.getInt(0), r.getString(1))).toSeq
      == Seq((1, "a"), (2, "b")))
    val pos = spark.sql(
      "SELECT posexplode(array('x', 'y', 'z'))").collect()
    assert(pos.map(r => (r.getInt(0), r.getString(1))).toSeq
      == Seq((0, "x"), (1, "y"), (2, "z")))
    val outer = spark.sql(
      "SELECT explode_outer(CAST(NULL AS ARRAY<INT>))").collect()
    assert(outer.length == 1 && outer(0).isNullAt(0))
  }

  test("ROUND parity Spark vs DuckDB over generated doubles (SURVEY §5.4/§5.6)") {
    // Generated (non-adversarial) doubles must round identically — this is
    // what the corpus relies on. Exact-decimal boundary literals like 1.005
    // are checked separately below: they DIVERGE on raw doubles (Spark
    // rounds the shortest decimal representation HALF_UP → 1.01; DuckDB
    // rounds the binary value 1.00499… → 1.00), and §5.4's pre-approved
    // fallback — ROUND(CAST(x AS DECIMAL(18,6)), n) — restores parity.
    val doubles = samples(Gen.choose(-1e6, 1e6), 60) ++
      Seq(0.125, 0.135, 2.675, -0.125)
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val sparkRounded = doubles.zipWithIndex
        .map { case (d, i) => (i, d) }.toDF("i", "d")
        .selectExpr("i", "round(d, 2) r2", "round(d, 4) r4")
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val st = conn.createStatement()
      doubles.zipWithIndex.foreach { case (d, i) =>
        val rs = st.executeQuery(
          s"SELECT round(CAST($d AS DOUBLE), 2), round(CAST($d AS DOUBLE), 4)")
        rs.next()
        val (s2, s4) = sparkRounded(i)
        assert(s2 == rs.getDouble(1), s"round($d, 2)")
        assert(s4 == rs.getDouble(2), s"round($d, 4)")
      }
      // the documented fallback restores parity on boundary literals
      for (d <- Seq(1.005, 999999.995, 2.675, -1.005)) {
        val sp = spark.sql(
          s"SELECT CAST(ROUND(CAST($d AS DECIMAL(18,6)), 2) AS DOUBLE)")
          .collect()(0).getDouble(0)
        val rs = st.executeQuery(
          s"SELECT CAST(ROUND(CAST($d AS DECIMAL(18,6)), 2) AS DOUBLE)")
        rs.next()
        assert(sp == rs.getDouble(1), s"decimal-fallback round($d, 2)")
      }
    } finally conn.close()
  }
}
