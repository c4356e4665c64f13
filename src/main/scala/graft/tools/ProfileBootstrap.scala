package graft.tools

import org.apache.spark.sql.functions._

import graft.{EtlSession, Tables}

/** Dev-only q216 sub-plan profiler. */
object ProfileBootstrap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = EtlSession.create("local[32]", 32, "profile-bootstrap")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $label"); r
    }
    val ev = Tables.events(spark, sfDir)
    time("events count")(ev.count())
    val base = ev.select(col("event_type").as("__g"),
      col("event_id").as("__id"),
      floor(col("value") * 1000).cast("long").as("__x"))
    for (i <- 1 to 2) {
      time(s"explode only #$i")(base
        .withColumn("__r", explode(sequence(lit(0L), lit(39L))))
        .select(count(lit(1))).collect())
      time(s"explode+md5 #$i")(base
        .withColumn("__r", explode(sequence(lit(0L), lit(39L))))
        .withColumn("__h", md5(concat_ws(":", col("__id").cast("string"),
          call_function("div", col("__r"), lit(4)).cast("string"),
          lit("q216"))))
        .select(count(col("__h"))).collect())
      time(s"explode+md5+conv #$i")(base
        .withColumn("__r", explode(sequence(lit(0L), lit(39L))))
        .withColumn("__h", md5(concat_ws(":", col("__id").cast("string"),
          call_function("div", col("__r"), lit(4)).cast("string"),
          lit("q216"))))
        .withColumn("__u", conv(call_function("substring", col("__h"),
          (pmod(col("__r"), lit(4)) * 8 + 1).cast("int"), lit(8)), 16, 10)
          .cast("bigint").cast("double") / lit(4294967296.0))
        .select(sum(col("__u"))).collect())
      time(s"full agg to means #$i")(base
        .withColumn("__r", explode(sequence(lit(0L), lit(39L))))
        .withColumn("__h", md5(concat_ws(":", col("__id").cast("string"),
          call_function("div", col("__r"), lit(4)).cast("string"),
          lit("q216"))))
        .withColumn("__u", conv(call_function("substring", col("__h"),
          (pmod(col("__r"), lit(4)) * 8 + 1).cast("int"), lit(8)), 16, 10)
          .cast("bigint").cast("double") / lit(4294967296.0))
        .withColumn("__w", when(col("__u") < 0.9196986029286058, 1L)
          .otherwise(2L))
        .groupBy("__g", "__r")
        .agg(sum(col("__w")).as("sw"), sum(col("__w") * col("__x")).as("swx"))
        .select(count(lit(1))).collect())
      time(s"operator full #$i")(
        graft.ops.Sampling.poissonBootstrap(ev, "event_type", "event_id",
          floor(col("value") * 1000).cast("long"), 40, 0.05, "q216")
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
