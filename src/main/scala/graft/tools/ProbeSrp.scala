package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** r17 A/B probe for the SRP signing kernel (VERDICT r16 item 5):
  * recomputes q286's band signatures with an UNROLLED codegen'd
  * Σ get(arr,i)·plane(i) kernel inline, compares every (id, bands) row
  * EXACTLY against `Similarity.srpSignatures` (the interpreted
  * aggregate(zip_with) dot), and times both signing passes min-of-2
  * through the noop sink. Measured sf0.1: bands identical, HOF 0.59 s
  * vs unrolled 3.2 s (flat sum; 11.6 s as a CASE-guarded sum that
  * blocks codegen splitting) — the unrolled kernel was REJECTED and
  * srpSignatures keeps the HOF. Exits nonzero on any band mismatch. */
object ProbeSrp {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.EtlSession.create("local[32]", 32, "probe-srp")
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, sf)
    val emb = graft.Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000)).as("vq"))
    val planes = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").cast("int").as("plane"), col("vq").as("vec"))
    val bandBits = 4

    // Candidate kernel: unrolled codegen'd sum (flat, splittable form
    // with the length guard as a null-propagating addend)
    def unrolledSigs(): DataFrame = {
      val ps = planes.select(col("plane").cast("int"), col("vec"))
        .collect()
        .map(r => (r.getInt(0),
          r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue)
            .toVector: Seq[Double]))
        .sortBy(_._1)
      val arrD = col("arr").cast("array<double>")
      def dot(vec: Seq[Double]): Column = {
        val guard = when(size(col("arr")) === vec.length, lit(0.0))
          .otherwise(lit(null).cast("double"))
        if (vec.isEmpty) guard
        else vec.indices.map(i => get(arrD, lit(i)) * lit(vec(i)))
          .reduce(_ + _) + guard
      }
      val bandKeys = ps.grouped(bandBits).map { grp =>
        grp.zipWithIndex.map { case ((_, vec), j) =>
          when(dot(vec) >= 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
      }.toSeq
      emb.select(col("vec_id").as("id"), col("vq").as("arr"))
        .withColumn("bands", array(bandKeys: _*))
    }
    val o = unrolledSigs().select("id", "bands")
    val n = graft.ops.Similarity
      .srpSignatures(emb, "vec_id", "vq", planes, bandBits)
      .select("id", "bands")
    val diff = o.exceptAll(n).count() + n.exceptAll(o).count()
    println(s"band_rows_diff=$diff")

    def t(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val to = (1 to 2).map(_ => t(o)).min
    val tn = (1 to 2).map(_ => t(n)).min
    println(f"sign_unrolled_min2=$to%.3f sign_hof_min2=$tn%.3f")
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
