package graft.tools

import org.apache.spark.sql.functions._
import graft.{EtlSession, Tables}

/** Scratch probe (r16): per-round timing/size of the q179 k-core peel. */
object ProbeKcore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = EtlSession.create("local[32]", 32, "probe-kcore")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    val j = Tables.table(spark, sfDir, "orders")
      .join(Tables.table(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_quantity") >= 30)
    val edges = j.select((col("o_custkey") * 2).as("u"),
      (col("l_partkey") * 2 + 1).as("v"))
    val k = 8
    val t00 = System.nanoTime()
    val base = edges
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
    var ee = base.union(base.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    println(f"init: ${(System.nanoTime()-t00)/1e9}%6.2f s, edges=${ee.count()}")
    var n = -1L; var it = 0; var done = false
    while (!done && it < 50) {
      val t0 = System.nanoTime()
      val deg = ee.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("u").as("node"), col("deg")).localCheckpoint()
      val m = deg.count()
      val t1 = System.nanoTime()
      done = m == n || m == 0
      if (!done) {
        val nextEe = ee
          .join(deg.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(deg.select(col("node").as("v")), Seq("v"), "left_semi")
          .localCheckpoint()
        val ne = nextEe.count()
        ee.unpersist(); ee = nextEe
        println(f"round $it%2d: deg+count ${(t1-t0)/1e9}%5.2f s, filter ${(System.nanoTime()-t1)/1e9}%5.2f s, alive=$m%8d edges=$ne%9d")
      } else {
        println(f"round $it%2d: deg+count ${(t1-t0)/1e9}%5.2f s, CONVERGED alive=$m")
        ee.unpersist()
      }
      n = m; it += 1
    }
    println(f"total ${(System.nanoTime()-t00)/1e9}%6.2f s, rounds=$it")
    spark.stop()
  }
}
