package graft.tools

import graft.{EtlSession, SparkEntry, Tables}

/** Dev-only repeat profiler: runs the named corpus queries N times in
  * one session to separate first-run structure cost (plan/exchange/JIT
  * warmup) from the steady-state cost the plan actually has. Usage:
  * ProfileRepeat <sfDir> <n> <q1,q2,...>. Not part of the contract. */
object ProfileRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args(2).split(",").toSet
    val spark = EtlSession.create("local[32]", 32, "profile-repeat")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    for (q <- SparkEntry.corpus if names.exists(p =>
        q.name == p || q.name.startsWith(p + "_"))) {
      for (i <- 1 to n) {
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  ${q.name} #$i")
      }
    }
    spark.stop()
  }
}
