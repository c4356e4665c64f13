package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 equivalence probe for the distributed exact-percentile pass
  * (`Stats.exactPercentiles`, VERDICT r16 item 4): compares its
  * boundary array BIT-FOR-BIT (doubleToRawLongBits) against the
  * builtin single-reducer `percentile(x, ps)` on the fixture column
  * q167 uses plus adversarial synthetics (integral knot positions,
  * heavy ties, N=1, all-null). Exits nonzero on any mismatch. */
object ProbePercentiles {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.EtlSession.create("local[32]", 32, "probe-percentiles")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var failed = false

    def check(name: String, df: DataFrame, colName: String,
              ps: Array[Double]): Unit = {
      val x = col(colName).cast("double")
      val oldRow = df.agg(percentile(x, typedLit(ps)).as("__bnds"))
        .collect()(0)
      val newRow = graft.ops.Stats.exactPercentiles(df, x, ps).collect()(0)
      def bits(r: org.apache.spark.sql.Row): Seq[Long] =
        if (r.isNullAt(0)) null
        else r.getSeq[Double](0).map(java.lang.Double.doubleToRawLongBits)
      val (o, n) = (bits(oldRow), bits(newRow))
      val ok = o == n
      if (!ok) failed = true
      println(s"[$name] ${if (ok) "OK" else s"MISMATCH old=$o new=$n"}")
    }

    val ps8 = (1 until 8).map(_.toDouble / 8).toArray
    graft.Tables.register(spark, sf)
    check("lineitem.l_extendedprice sf", graft.Tables.table(spark, sf,
      "lineitem"), "l_extendedprice", ps8)
    check("lineitem.l_quantity (heavy ties)", graft.Tables.table(spark, sf,
      "lineitem"), "l_quantity", ps8)
    check("lineitem.l_tax (few distinct)", graft.Tables.table(spark, sf,
      "lineitem"), "l_tax", ps8)
    // N = 17: (N-1)/8 knots are integral -> lower==higher short-circuit
    check("1..17 integral knots",
      spark.range(1, 18).select(col("id").cast("double").as("v")), "v", ps8)
    // ties spanning knots: floor/ceil land in the same distinct value
    check("i%5 ties", spark.range(0, 1000)
      .select((col("id") % 5).cast("double").as("v")), "v", ps8)
    check("N=1", Seq(42.5).toDF("v"), "v", ps8)
    check("with nulls", spark.range(0, 100)
      .select(when(col("id") % 3 === 0, col("id").cast("double")).as("v")),
      "v", ps8)
    check("all null", Seq.empty[Option[Double]].toDF("v")
      .union(spark.range(5).select(lit(null).cast("double"))), "v", ps8)
    // irrational-ish knots (non-dyadic percentages)
    check("non-dyadic ps", graft.Tables.table(spark, sf, "lineitem"),
      "l_discount", Array(0.1, 0.33, 0.5000001, 0.77, 0.999))
    println(if (failed) "FAILED" else "ALL_MATCH")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
