package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.8c L3).
  *
  * Baseline: exact brute-force cosine top-k — a broadcast join when the
  * query side is small (the common case: q queries × N corpus), so the
  * corpus never shuffles and the kernel is the codegen'd
  * `cosine_similarity` expression.
  *
  * Scale paths for corpus×corpus or huge query sets:
  *  - BucketedRandomProjectionLSH on L2-normalized vectors (euclidean
  *    distance on unit vectors is monotone in cosine: cos = 1 - d²/2), so
  *    candidate generation is an equi-join on hash buckets.
  *  - IVF (inverted-file) via k-means coarse quantization: vectors are
  *    partitioned by nearest centroid; a query probes only `nprobe`
  *    nearest cells. Centroids are tiny → broadcast; the big side
  *    shuffles once at build time, never at query time.
  */
object Similarity {

  private val toVec = udf { arr: Seq[Float] =>
    Vectors.dense(arr.map(_.toDouble).toArray)
  }

  private val l2norm = udf { v: MlVector =>
    val n = Vectors.norm(v, 2.0)
    if (n == 0.0) v else Vectors.dense(v.toArray.map(_ / n))
  }

  /** Exact cosine top-k: for each query vector (idCol in `queryIds`), the
    * k nearest corpus vectors. Query side is broadcast. */
  def exactTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryFilter: DataFrame => DataFrame, k: Int): DataFrame = {
    graft.functions.Registry.registerAll(emb.sparkSession)
    val q = queryFilter(emb).select(col(idCol).as("q"), col(vecCol).as("qv"))
    val c = emb.select(col(idCol).as("v"), col(vecCol).as("cv"))
    val sim = expr("cosine_similarity(qv, cv)")
    val w = Window.partitionBy("q").orderBy(desc("sim"), col("v"))
    broadcast(q).join(c, col("q") =!= col("v"))
      .select(col("q"), col("v"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q", "v", "sim", "rn")
  }

  /** ANN top-k via bucketed random projection LSH on normalized vectors.
    * Returns the same shape as exactTopK; recall < 1 traded for bucketed
    * candidate generation (validated >= 0.9 vs exact in the test suite). */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryFilter: DataFrame => DataFrame, k: Int,
              bucketLength: Double = 0.5, numHashTables: Int = 6): DataFrame = {
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("arr"))
      .withColumn("nv", l2norm(toVec(col("arr"))))
      .cache()
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nv").setOutputCol("buckets")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(vecs)
    val q = queryFilter(emb).select(col(idCol).as("qid"))
    val qv = vecs.join(broadcast(q), col("id") === col("qid"))
    // Euclidean distance 2.0 on unit vectors covers the full cosine range
    // [-1, 1]; candidates are pruned to top-k per query by exact cosine.
    val cand = model.approxSimilarityJoin(qv, vecs, 2.0, "dist")
      .select(col("datasetA.id").as("q"), col("datasetB.id").as("v"),
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("sim"))
      .filter(col("q") =!= col("v"))
    val w = Window.partitionBy("q").orderBy(desc("sim"), col("v"))
    // vecs stays cached: the returned plan is lazy (see Dedup note).
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("q", "v", "sim", "rn")
  }

  /** Embedding near-duplicate pairs: all (a, b), a < b, with cosine
    * similarity above `threshold` — the embedding-space analogue of
    * MinHash near-dedup. Scale path: BRP-LSH on normalized vectors; for
    * unit vectors cosine ≥ τ ⟺ euclidean distance ≤ sqrt(2 − 2τ), so the
    * LSH join prunes candidates and the exact cosine (codegen'd
    * expression) confirms — never an N² cross join. */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                            threshold: Double,
                            bucketLength: Double = 0.5,
                            numHashTables: Int = 6): DataFrame = {
    graft.functions.Registry.registerAll(emb.sparkSession)
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("arr"))
      .withColumn("nv", l2norm(toVec(col("arr"))))
      .cache()
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nv").setOutputCol("buckets")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(vecs)
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * threshold))
    val out = model.approxSimilarityJoin(vecs, vecs, maxDist, "dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"),
        expr("cosine_similarity(datasetA.arr, datasetB.arr)").as("sim"))
      .filter(col("a") < col("b") && col("sim") > threshold)
    out
  }

  /** IVF index: assign every vector to its nearest of `nlist` k-means
    * centroids. Returns (id, cell, nv). Build-once, query-many. */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16): (DataFrame, org.apache.spark.ml.clustering.KMeansModel) = {
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("arr"))
      .withColumn("nv", l2norm(toVec(col("arr"))))
    // Random init + few iterations: an IVF coarse quantizer only needs a
    // balanced partition of the space, not converged clusters — kmeans||
    // init rounds dominate the fit cost and buy nothing here.
    val km = new KMeans().setK(nlist).setFeaturesCol("nv")
      .setPredictionCol("cell").setSeed(42L).setMaxIter(5)
      .setInitMode("random")
    val model = km.fit(vecs)
    (model.transform(vecs).select("id", "cell", "nv", "arr"), model)
  }

  /** IVF query: probe the `nprobe` nearest cells per query vector, exact
    * cosine within the probed cells only. */
  def ivfTopK(indexed: DataFrame, model: org.apache.spark.ml.clustering.KMeansModel,
              queryIds: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val spark = indexed.sparkSession
    graft.functions.Registry.registerAll(spark)
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    val q = indexed.join(broadcast(queryIds.select(col(queryIds.columns.head).as("qid"))),
        col("id") === col("qid"))
      .select(col("id").as("q"), col("arr").as("qarr"))
    // nearest nprobe cells per query — centroid table is tiny, broadcast.
    val probeW = Window.partitionBy("q").orderBy(desc("csim"), col("cell"))
    val probes = broadcast(q).crossJoin(broadcast(centroids))
      .select(col("q"), col("qarr"), col("cell"),
        expr("cosine_similarity(qarr, centroid)").as("csim"))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nprobe)
      .select("q", "qarr", "cell")
    val w = Window.partitionBy("q").orderBy(desc("sim"), col("v"))
    probes.join(indexed, Seq("cell"))
      .filter(col("q") =!= col("id"))
      .select(col("q"), col("id").as("v"),
        expr("cosine_similarity(qarr, arr)").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("q", "v", "sim", "rn")
  }
}
