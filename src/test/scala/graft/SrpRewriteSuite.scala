package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.plans.SrpJoinRewrite

/** The opt-in cosine-threshold-join → SRP-LSH rewrite
  * (graft.plans.SrpJoinRewrite — the SURVEY §4 stretch goal): plan
  * shape, exactness guarantees (subset, no duplicates, multiplicity),
  * recall on planted near-dups, the leave-alone guards, and the
  * SparkSessionExtensions deployment path. */
class SrpRewriteSuite extends SparkTestBase {

  // runtime injection path: the rule joins the shared session's
  // optimizer once; it is inert while the conf flag (default false)
  // stays off, so other suites never see it
  private lazy val injected: Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ new SrpJoinRewrite
  }

  private def withRewrite[A](body: => A): A = {
    injected
    spark.conf.set("spark.graft.srpJoinRewrite.enabled", "true")
    try body
    finally spark.conf.unset("spark.graft.srpJoinRewrite.enabled")
  }

  private def cartesianish(p: SparkPlan): Boolean = p.exists {
    case _: CartesianProductExec => true
    case _: BroadcastNestedLoopJoinExec => true
    case _ => false
  }

  private def bandJoined(p: SparkPlan): Boolean = p.exists {
    case j: BaseJoinExec =>
      j.leftKeys.exists(_.toString.contains("__srp_band"))
    case _ => false
  }

  /** 400 base vectors in 16 directions + 40 jittered copies at
    * cos ≈ 0.999 (the OpsSuite srpNearDupPairs fixture), with `dups`
    * extra copies of row 0 to exercise multiplicity. */
  private def fixture(dups: Int = 0): (DataFrame, Set[(Long, Long)]) = {
    import spark.implicits._
    def h(a: Long, b: Long): Double = {
      var z = a * 0x9E3779B97F4A7C15L + b * 0xD1B54A32D192ED03L +
        0x8CB92BA72F3D8DD7L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)).toDouble / Long.MaxValue
    }
    val dim = 32
    val base = (0L until 400L).map { id =>
      (id, (0 until dim).map(d => h(id % 16, d) + 0.05 * h(id, d + 99)))
    }
    val copies = (0L until 40L).map { i =>
      val src = base(i.toInt * 7)
      (1000L + i, src._2.map(x => x + 0.001 * h(i, 41)))
    }
    val extra = (0 until dups).map(k => (2000L + k, base.head._2))
    val planted = (0L until 40L).map(i => (i * 7, 1000L + i)).toSet
    ((base ++ copies ++ extra).toDF("id", "v"), planted)
  }

  private def thresholdJoin(df: DataFrame): DataFrame =
    df.as("x").join(df.as("y"),
        expr("cosine_similarity(x.v, y.v) >= 0.99") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))

  test("disabled by default: the cosine-threshold join stays a " +
      "Cartesian plan and the rule leaves the session untouched") {
    functions.Registry.registerAll(spark)
    injected
    val (df, _) = fixture()
    val q = thresholdJoin(df)
    assert(cartesianish(q.queryExecution.sparkPlan),
      "without the opt-in flag the plan must be the brute-force join")
    assert(!bandJoined(q.queryExecution.sparkPlan))
  }

  test("enabled: plans as a banded equi-join — subset of exact, no " +
      "duplicate pairs, planted recall >= 0.9") {
    functions.Registry.registerAll(spark)
    val (df, planted) = fixture()
    val exact = thresholdJoin(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRewrite {
      val q = thresholdJoin(df)
      val plan = q.queryExecution.sparkPlan
      assert(!cartesianish(plan), "rewrite must remove the Cartesian join")
      assert(bandJoined(plan), "expected the (band, key) equi-join")
      val rows = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.size == rows.distinct.size,
        "first_equal_band must emit each pair at most once")
      val got = rows.toSet
      assert(got.subsetOf(exact), "rewrite may only MISS pairs, never invent")
      val recall = planted.count(got.contains).toDouble / planted.size
      assert(recall >= 0.9, s"planted recall $recall")
    }
  }

  test("input multiplicity is preserved: duplicate left rows emit " +
      "duplicate matches, exactly as the brute-force join") {
    functions.Registry.registerAll(spark)
    val (df, _) = fixture(dups = 2)
    // rows 2000/2001 are copies of row 0: each pairs with row 0 and
    // with each other, and the pair multiset must match brute force
    val exact = thresholdJoin(df).filter(col("a") >= 2000 || col("b") >= 2000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    withRewrite {
      val got = thresholdJoin(df).filter(col("a") >= 2000 || col("b") >= 2000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == exact,
        "identical copies MUST collide on every band — equality here")
    }
  }

  test("leave-alone guards: equi-conjunct joins, low thresholds, and " +
      "outer joins are not rewritten") {
    functions.Registry.registerAll(spark)
    val (df, _) = fixture()
    withRewrite {
      // an equi-conjunct means the planner hash-joins without help
      val equi = df.as("x").join(df.as("y"),
        col("x.id") === col("y.id") &&
          expr("cosine_similarity(x.v, y.v) >= 0.99"))
      assert(!bandJoined(equi.queryExecution.sparkPlan))
      // below minThreshold the recall formula collapses — refuse
      val low = df.as("x").join(df.as("y"),
        expr("cosine_similarity(x.v, y.v) >= 0.3") &&
          col("x.id") < col("y.id"))
      assert(!bandJoined(low.queryExecution.sparkPlan))
      assert(cartesianish(low.queryExecution.sparkPlan))
      // outer joins keep their null-extension semantics
      val outer = df.as("x").join(df.as("y"),
        expr("cosine_similarity(x.v, y.v) >= 0.99"), "left_outer")
      assert(!bandJoined(outer.queryExecution.sparkPlan))
    }
  }

  test("SparkSessionExtensions deployment path: a session built with " +
      "GraftExtensions rewrites under the flag") {
    import org.apache.spark.sql.SparkSession
    val prior = spark // keep the shared session object alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      import s2.implicits._
      val df = (0L until 50L).map(i =>
        (i, Seq.tabulate(8)(d => ((i % 4) * 31 + d).toDouble))).toDF("id", "v")
      s2.conf.set("spark.graft.srpJoinRewrite.enabled", "true")
      val q = df.as("x").join(df.as("y"),
          expr("cosine_similarity(x.v, y.v) >= 0.99") &&
            col("x.id") < col("y.id"))
        .select(col("x.id"), col("y.id"))
      assert(bandJoined(q.queryExecution.sparkPlan),
        "the injected optimizer rule must fire in an extensions session")
      assert(q.count() > 0)
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
  }

  test("srp_bands / first_equal_band kernels: shape, determinism, " +
      "zero-vector path, first-agreement index") {
    functions.Registry.registerAll(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(1.0, 2.0, -3.0)),
      (2L, Seq(1.0, 2.0, -3.0)),  // identical → identical bands
      (3L, Seq(0.0, 0.0, 0.0)))   // zero vector → deterministic all-ones
      .toDF("id", "v")
    val got = rows.select(col("id"),
        expr("srp_bands(v, 12, 4, 7)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1).size == 3 && got(1) == got(2))
    assert(got(3) == Seq(15L, 15L, 15L), s"zero vector bands: ${got(3)}")
    assert(got(1).forall(k => k >= 0 && k < 16))
    val fe = spark.sql(
      """SELECT first_equal_band(array(1L, 2L, 3L), array(9L, 2L, 3L)) a,
        |       first_equal_band(array(1L, 2L), array(3L, 4L)) b""".stripMargin)
      .collect()(0)
    assert(fe.getInt(0) == 1 && fe.getInt(1) == -1)
  }
}
