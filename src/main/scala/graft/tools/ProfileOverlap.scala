package graft.tools

import org.apache.spark.sql.functions._

import graft.{EtlSession, Tables}

/** Dev-only stage profiler for q170 (FuzzyJoin.overlapJoin) — times each
  * sub-plan of the PPJoin-style pipeline in isolation to attribute the
  * bench cost. Not part of the driver contract. */
object ProfileOverlap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = EtlSession.create("local[32]", 32, "profile-overlap")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $label"); r
    }
    val docs = Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 400)
    time("warmup count")(docs.count())
    // piecewise
    val toks = docs.select(col("doc_id").as("id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
      .filter(col("tok") =!= "")
    time("toks count")(toks.count())
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    time("dfreq count")(dfreq.count())
    val vocab = dfreq.withColumn("tid",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("df"), col("tok"))).cast("long"))
      .select("tok", "tid")
    time("vocab count")(vocab.count())
    val ranked = toks.join(vocab, "tok").groupBy("id")
      .agg(array_sort(collect_list(col("tid"))).as("toks"))
      .withColumn("k", size(col("toks")))
      .filter(col("k") >= 28)
      .withColumn("prefix", slice(col("toks"), lit(1),
        (col("k") - 28 + 1).cast("int")))
    time("ranked count")(ranked.count())
    val r2 = ranked.cache()
    time("ranked cache materialize")(r2.count())
    val pref = r2.select(col("id"), col("toks"), explode(col("prefix")).as("pt"))
    time("pref count")(pref.count())
    val cand = pref.alias("x").join(pref.alias("y"),
        col("x.pt") === col("y.pt") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.toks").as("ta"), col("y.toks").as("tb"))
      .distinct()
    time("cand distinct count")(cand.count())
    val out = cand.withColumn("overlap",
        size(array_intersect(col("ta"), col("tb"))))
      .filter(col("overlap") >= 28)
    time("verify count")(out.count())
    for (i <- 1 to 2)
      time(s"overlapJoin full #$i")(
        graft.ops.FuzzyJoin.overlapJoin(docs, "doc_id", "text", 28)
          .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
