package graft.tools

import org.apache.spark.sql.functions._
import graft.{EtlSession, Tables}
import graft.ops.Similarity

/** Scratch probe (r16): stage timing of the q119 IVF+PQ pipeline. */
object ProbeQ119 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = EtlSession.create("local[32]", 32, "probe-q119")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    for (rnd <- 1 to 2) {
      println(s"--- round $rnd ---")
      val emb = Tables.table(spark, sfDir, "embeddings")
      val (_, centroids) = time("ivf train") {
        Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 16)
      }
      val (_, cb) = time("pq train") {
        Similarity.pqIndex(emb, "vec_id", "embedding", m = 8, kCent = 64)
      }
      val encoded = time("ivfPqIndex (lazy)") {
        Similarity.ivfPqIndex(emb, "vec_id", "embedding", centroids, cb)
      }
      val res = time("topK build (lazy+collects)") {
        Similarity.ivfPqTopK(encoded, centroids, cb,
          emb.filter(col("vec_id") < 5).select("vec_id"), k = 3,
          nprobe = 8, rerankFactor = 16)
      }
      time("topK noop") {
        res.withColumn("sim", round(col("sim"), 6)).orderBy("q", "rn")
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
