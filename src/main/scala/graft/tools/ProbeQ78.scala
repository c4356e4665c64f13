package graft.tools

import org.apache.spark.sql.functions._
import graft.{EtlSession, Tables}

/** Scratch measurement probe (r16 optimization round): times the stages of
  * the q78 minhash pipeline separately — signature build (old agg form vs
  * new projection form), banded candidate join, confirm. Not part of any
  * query path. */
object ProbeQ78 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = EtlSession.create("local[32]", 32, "probe-q78")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    val docs = Tables.table(spark, sfDir, "documents")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // OLD signature form: shingles UDTF + groupBy agg
    graft.functions.Registry.registerAll(spark)
    def oldSigs() = {
      val exploded = docs.select(col("doc_id").as("id"),
        expr("shingles(text, 3)"))
      val mins = (0 until 16).map(i =>
        min(xxhash64(col("shingle"), lit(i))).as(s"__m$i"))
      exploded.groupBy("id")
        .agg(collect_set(xxhash64(col("shingle"))).as("shs"), mins: _*)
        .select(col("id"), col("shs"),
          array((0 until 16).map(i => col(s"__m$i")): _*).as("sig"))
    }
    // NEW signature form (current code)
    def newSigs() = graft.ops.Dedup.minHashSignatures(
      graft.ops.Par.widen(docs, col("doc_id")), "doc_id", "text", 3, 16)

    for (r <- 1 to 3) {
      time(s"old sigs noop r$r") { noop(oldSigs()) }
      time(s"new sigs noop r$r") { noop(newSigs()) }
    }
    // full pipeline old vs new, via the public op (current code = new)
    for (r <- 1 to 3) {
      time(s"new full pairs r$r") {
        noop(graft.ops.Dedup.minHashNearDupPairs(docs, "doc_id", "text",
          3, 0.8))
      }
    }
    // candidate+confirm on top of a cached sig table (isolate the joins)
    val sigs = newSigs().cache()
    sigs.count()
    time("banded+confirm on cached") {
      val banded = sigs.select(col("id"),
        posexplode(transform(
          sequence(lit(0), (size(col("sig")) / 2).cast("int") - 1),
          b => xxhash64(slice(col("sig"), b * 2 + 1, lit(2)))))
          .as(Seq("band", "mh")))
      val cand = banded.alias("x").join(banded.alias("y"),
          col("x.band") === col("y.band") && col("x.mh") === col("y.mh") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      val j = size(array_intersect(col("sha"), col("shb"))).cast("double") /
        size(array_union(col("sha"), col("shb"))).cast("double")
      noop(cand
        .join(sigs.select(col("id").as("a"), col("shs").as("sha")), Seq("a"))
        .join(sigs.select(col("id").as("b"), col("shs").as("shb")), Seq("b"))
        .withColumn("__j", j).filter(col("__j") >= 0.8)
        .select(col("a"), col("b"), round(col("__j"), 4).as("jaccard")))
    }
    spark.stop()
  }
}
