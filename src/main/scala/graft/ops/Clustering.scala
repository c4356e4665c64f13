package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column (SURVEY.md §2.8c;
  * builder brief "similarity search — scale path").
  *
  * [[Similarity.ivfIndex]] trains its coarse quantizer on a bounded
  * driver-side sample — the faiss discipline, corpus-size independent but
  * sample-quality bound. This operator closes the gap for corpora where
  * the sample under-represents the distribution: full-corpus Lloyd
  * refinement where each iteration is ONE column-pruned scan + ONE
  * shuffle (the cell aggregation), with all per-row work codegen'd.
  *
  * Scale shape per [[lloydStep]]:
  *   - assignment is a PURE PROJECTION — centroids inline as literals
  *     (same inline-vs-array-literal crossover as [[Similarity.ivfAssign]],
  *     measured in BASELINE.md v6), zero joins, zero broadcasts;
  *   - the update is one hash aggregation with map-side partials over
  *     `dim` codegen'd SUM columns — k×dim driver state, never row data;
  *   - distances use |x−c|² = |x|² + |c|² − 2·x·c with the dot product
  *     through the codegen'd [[graft.functions.CosineSimilarity]] kernel
  *     (x·c = cos(x,c)·|x|·|c|); |x|² is constant across centroids so the
  *     argmin drops it. Zero vectors (cos → NULL) coalesce to dot 0 and
  *     land in the lowest-norm cell, ties to the lowest cell id — the
  *     deterministic convention shared with ivfAssign.
  *
  * Determinism contract (what lets q151 carry a DuckDB hash oracle): on
  * integer-valued inputs the update sums are exact in doubles and the
  * mean divides ONCE, so a single Lloyd step hash-replays cross-engine;
  * the suite additionally pins Spark's float argmin to the exact integer
  * argmin on the fixtures (OpsSuite "lloyd assignment matches exact").
  */
object Clustering {

  /** Same measured JIT-huge-method crossover as Similarity (BASELINE.md
    * v6: inline literal columns degrade past ~16 centroids; the
    * array-literal higher-order fallback stays flat to nlist=200). */
  private val InlineCentroidMax = 16

  private def collectCentroids(centroids: DataFrame): Array[(Int, Seq[Double])] = {
    // numeric-tolerant: centroid arrays may be integer-typed (e.g. a
    // FLOOR-quantized grid, q151) — everything runs in doubles internally
    val cents = centroids.select("cell", "centroid").collect()
      .map(r => (r.getAs[Number]("cell").intValue(),
        r.getSeq[Number](r.fieldIndex("centroid")).map(_.doubleValue)))
      .sortBy(_._1)
    require(cents.nonEmpty, "empty centroid table")
    cents
  }

  /** argmin cell over RAW (unnormalized) L2 distance, up to the per-row
    * |x|² constant: min over c of (|c|² − 2·|c|·cos(arr,c)·xn), where
    * `arr` is the vector expression and `xn` its L2 norm (computed once
    * per row). Struct field-wise min = lowest-cell tie-break. */
  private def argminCellExpr(cents: Array[(Int, Seq[Double])],
                             arr: Column, xn: Column): Column =
    if (cents.length <= InlineCentroidMax)
      array_min(array(cents.map { case (cell, cvec) =>
        val c2 = cvec.map(x => x * x).sum
        struct(
          (lit(c2) - lit(2.0 * math.sqrt(c2)) * xn *
            coalesce(graft.functions.Registry.cosineSim(
              arr, typedLit(cvec)), lit(0.0))).as("d2"),
          lit(cell).as("cell"))
      }: _*)).getField("cell")
    else {
      val centArr = typedLit(cents.map { case (cell, cvec) =>
        val c2 = cvec.map(x => x * x).sum
        (cell, c2, 2.0 * math.sqrt(c2), cvec)
      }.toSeq)
      array_min(transform(centArr, c =>
        struct(
          (c.getField("_2") - c.getField("_3") * xn *
            coalesce(graft.functions.Registry.cosineSim(
              arr, c.getField("_4")), lit(0.0))).as("d2"),
          c.getField("_1").as("cell")))).getField("cell")
    }

  private def cellExpr(cents: Array[(Int, Seq[Double])]): Column =
    argminCellExpr(cents, col("arr"), col("xn"))

  private def withAssignment(emb: DataFrame, idCol: String, vecCol: String,
                             cents: Array[(Int, Seq[Double])]): DataFrame = {
    graft.functions.Registry.registerAll(emb.sparkSession)
    val dbl = transform(col(vecCol), _.cast("double"))
    emb.select(col(idCol).as("id"), dbl.as("arr"))
      .withColumn("xn", sqrt(aggregate(col("arr"), lit(0.0),
        (acc, x) => acc + x * x)))
      .withColumn("cell", cellExpr(cents))
  }

  /** Nearest-centroid assignment: (id, cell, arr). Map-only — zero
    * shuffles, zero joins (plan-asserted in OpsSuite). */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame =
    withAssignment(emb, idCol, vecCol, collectCentroids(centroids))
      .select("id", "cell", "arr")

  /** ONE Lloyd update: assign every vector, recompute per-cell means.
    * Returns (cell, centroid, n) for OBSERVED cells only — empty-cell
    * policy belongs to the caller ([[refineCentroids]] keeps the previous
    * centroid; a pure step stays oracle-able). One scan, one shuffle;
    * the `dim` SUM columns aggregate with map-side partials. */
  def lloydStep(emb: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    val dim = cents.head._2.length
    val sums = (0 until dim).map(d =>
      sum(element_at(col("arr"), d + 1)).as(s"__s$d"))
    withAssignment(emb, idCol, vecCol, cents)
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("cell"),
        array((0 until dim).map(d => col(s"__s$d") / col("n")): _*)
          .as("centroid"),
        col("n"))
  }

  /** Total within-cluster squared L2 — the Lloyd objective. One row
    * (inertia, n); used by the suite to assert monotone improvement. */
  def inertia(emb: DataFrame, idCol: String, vecCol: String,
              centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    val terms = cents.map { case (_, cvec) =>
      val c2 = cvec.map(x => x * x).sum
      lit(c2) - lit(2.0 * math.sqrt(c2)) * col("xn") *
        coalesce(graft.functions.Registry.cosineSim(
          col("arr"), typedLit(cvec)), lit(0.0))
    }
    withAssignment(emb, idCol, vecCol, cents)
      .withColumn("d2", col("xn") * col("xn") + array_min(array(terms: _*)))
      .agg(sum(col("d2")).as("inertia"), count(lit(1)).as("n"))
  }

  /** Deterministic seeds: the k vectors winning the hash-ordered top-k
    * (the [[Similarity.ivfIndex]] sampling rule — pseudo-random spread,
    * reproducible, TakeOrdered so only k rows ever reach the driver). */
  def seedCentroids(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(k > 0, s"k must be positive, got $k")
    val rows = emb
      .select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(k)
      .collect() // ≤ k × dim doubles
    require(rows.nonEmpty, "seedCentroids: empty input")
    rows.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
      .toSeq.toDF("cell", "centroid")
  }

  /** Full-corpus Lloyd refinement: `iters` × [[lloydStep]], carrying the
    * previous centroid through for cells that went empty (deterministic —
    * no reseed randomness; the standing cell ids stay stable, which is
    * what lets a refined quantizer drop into [[Similarity.ivfAssign]] /
    * `ivfTopKFromTables` unchanged). Early-stops on a fixed point.
    * Driver state per iteration: k×dim doubles. */
  def refineCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      centroids: DataFrame, iters: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    var current = collectCentroids(centroids).toSeq
    var it = 0
    var moved = true
    while (it < iters && moved) {
      val curDf = current.toDF("cell", "centroid")
      val updated = lloydStep(emb, idCol, vecCol, curDf)
        .select("cell", "centroid").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
      val next = current.map { case (cell, prev) =>
        (cell, updated.getOrElse(cell, prev))
      }
      moved = next != current
      current = next
      it += 1
    }
    current.toDF("cell", "centroid")
  }

  /** Seeded full-corpus k-means: deterministic seeds + Lloyd refinement.
    * Returns (assignments(id, cell, arr), centroids(cell, centroid)) —
    * the [[Similarity.ivfIndex]] contract, trained on the WHOLE corpus
    * instead of a driver sample. */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int = 5): (DataFrame, DataFrame) = {
    val cents = refineCentroids(emb, idCol, vecCol,
      seedCentroids(emb, idCol, vecCol, k), iters)
    (assign(emb, idCol, vecCol, cents), cents)
  }

  // --- PQ codebook refinement --------------------------------------------

  /** The exploded (subspace, sv, svn, cell) view shared by the PQ-Lloyd
    * paths: per row, every subspace's slice is emitted map-side
    * (Generate — no shuffle), its norm computed once, and the cell
    * chosen by a per-subspace CASE over the argmin expression, so ALL
    * m sub-quantizers assign in ONE pass over the corpus. */
  private def pqExploded(emb: DataFrame, vecCol: String,
                         codebooks: Array[Array[Array[Double]]]): DataFrame = {
    graft.functions.Registry.registerAll(emb.sparkSession)
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val dbl = transform(col(vecCol), _.cast("double"))
    val parts = (0 until m).map { s =>
      struct(lit(s).as("subspace"),
        slice(dbl, s * dsub + 1, dsub).as("sv"))
    }
    val cellCol = (0 until m).foldLeft(lit(-1): Column) { (acc, s) =>
      val cents = codebooks(s).zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }
      when(col("subspace") === s,
        argminCellExpr(cents, col("sv"), col("svn"))).otherwise(acc)
    }
    emb.select(explode(array(parts: _*)).as("p"))
      .select(col("p.subspace").as("subspace"), col("p.sv").as("sv"))
      .withColumn("svn", sqrt(aggregate(col("sv"), lit(0.0),
        (acc, x) => acc + x * x)))
      .withColumn("cell", cellCol)
  }

  /** ONE Lloyd update of EVERY PQ sub-quantizer in a single job:
    * (subspace, cell, centroid, n) for observed (subspace, cell) pairs.
    * The explode is map-side; the only shuffle is the
    * (subspace, cell)-keyed aggregation of `dsub` SUM columns with
    * map-side partials — m·k groups of partial rows, never vectors.
    * Operates on the vectors AS GIVEN (no normalization) so a single
    * step is oracle-able on an integer grid (q153);
    * [[refinePqCodebooks]] layers the PqEncode normalization
    * convention on top. */
  def pqLloydStep(emb: DataFrame, idCol: String, vecCol: String,
                  codebooks: Array[Array[Array[Double]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty, "empty codebooks")
    val dsub = codebooks.head.head.length
    val sums = (0 until dsub).map(d =>
      sum(element_at(col("sv"), d + 1)).as(s"__s$d"))
    pqExploded(emb, vecCol, codebooks)
      .groupBy("subspace", "cell")
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("subspace"), col("cell"),
        array((0 until dsub).map(d => col(s"__s$d") / col("n")): _*)
          .as("centroid"),
        col("n"))
  }

  /** Total PQ sub-quantization error (the sum over subspaces of the
    * Lloyd objective on the sub-vectors) — one row (err, n_rows). */
  def pqQuantError(emb: DataFrame, idCol: String, vecCol: String,
                   codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val d2Col = (0 until m).foldLeft(lit(0.0): Column) { (acc, s) =>
      val terms = codebooks(s).map { cvec =>
        val c2 = cvec.map(x => x * x).sum
        lit(c2) - lit(2.0 * math.sqrt(c2)) * col("svn") *
          coalesce(graft.functions.Registry.cosineSim(
            col("sv"), typedLit(cvec.toSeq)), lit(0.0))
      }
      when(col("subspace") === s,
        col("svn") * col("svn") + array_min(array(terms: _*))).otherwise(acc)
    }
    pqExploded(emb, vecCol, codebooks)
      .withColumn("d2", d2Col)
      .agg(sum(col("d2")).as("err"),
        (count(lit(1)) / m).cast("long").as("n_rows"))
  }

  /** Full-corpus Lloyd refinement of sample-trained PQ codebooks
    * ([[Similarity.pqIndex]] trains on a bounded driver sample — same
    * discipline, same gap as the IVF coarse quantizer). Vectors
    * normalize exactly as the codegen'd `pq_encode` kernel does (zero
    * vectors pass through), so refined codebooks drop into
    * [[Similarity.pqAssign]] / `pqTopK` / the persisted
    * [[Similarity.pqCodebooks]] table unchanged. Empty (subspace, cell)
    * pairs keep their previous centroid; early-stops on a fixed point.
    * Driver state per iteration: m·k·dsub doubles. */
  def refinePqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
                        codebooks: Array[Array[Array[Double]]],
                        iters: Int = 5): Array[Array[Array[Double]]] = {
    val dbl = transform(col(vecCol), _.cast("double"))
    val nrm = sqrt(aggregate(dbl, lit(0.0), (acc, x) => acc + x * x))
    val nv = when(nrm === lit(0.0), dbl).otherwise(transform(dbl, _ / nrm))
    val base = emb.select(col(idCol).as("id"), nv.as("__nv"))
    var cur = codebooks.map(_.map(_.clone))
    var it = 0
    var moved = true
    while (it < iters && moved) {
      val updated = pqLloydStep(base, "id", "__nv", cur)
        .select("subspace", "cell", "centroid").collect()
        .map(r => ((r.getInt(0), r.getInt(1)),
          r.getSeq[Double](2).toArray)).toMap
      moved = false
      val next = Array.tabulate(cur.length) { s =>
        Array.tabulate(cur(s).length) { c =>
          updated.get((s, c)) match {
            case Some(v) =>
              if (!java.util.Arrays.equals(v, cur(s)(c))) moved = true
              v
            case None => cur(s)(c) // empty cell: keep previous
          }
        }
      }
      cur = next
      it += 1
    }
    cur
  }

  /** Simplified (centroid-based) silhouette — the cluster-quality
    * readout after [[lloydStep]]/[[refineCentroids]]: per point,
    * a = distance to its OWN centroid, b = distance to the nearest
    * OTHER centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; returned per
    * cluster as (cell, n, mean_silhouette) plus the point count. The
    * classic all-pairs silhouette is O(n²) and dead at scale; the
    * centroid form (Hruschka et al.) is ONE map-only pass over k
    * literal centroid distances — the same zero-join shape as
    * [[assign]].
    *
    * Exactness contract: vectors AND centroids must be INTEGRAL
    * (quantize first — the q151 FLOOR grid), so every squared distance
    * is an exact integer via zip_with dot products; a, b are
    * correctly-rounded sqrts of exact integers; one division per
    * point; the per-cluster mean folds point terms in id order (in-row
    * ordered fold — cluster-sized lists: sample upstream at 100 TB, or
    * mean via a quantized grid). A point landing EXACTLY on two
    * centroids (a = b = 0) contributes s = 0. */
  def silhouetteSimplified(emb: DataFrame, idCol: String, vecCol: String,
                           centroids: DataFrame): DataFrame = {
    val cents = centroids.select("cell", "centroid").collect()
      .map(r => (r.getAs[Number]("cell").intValue(),
        r.getSeq[Number](r.fieldIndex("centroid")).map(_.longValue)))
      .sortBy(_._1)
    require(cents.length >= 2, "silhouette needs >= 2 centroids")
    val arr = col("arr")
    val x2 = aggregate(arr, lit(0L), (acc, x) => acc + x * x)
    val structs = array(cents.map { case (cell, cvec) =>
      val c2 = cvec.map(x => x * x).sum
      val dot = aggregate(
        zip_with(arr, typedLit(cvec), (a, c) => a * c),
        lit(0L), (acc, x) => acc + x)
      struct((col("__x2") + lit(c2) - lit(2L) * dot).as("d2"),
        lit(cell).as("cell"))
    }: _*)
    val pts = emb
      .select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("long")).as("arr"))
      .withColumn("__x2", x2)
      .withColumn("__sts", structs)
      .withColumn("__own", array_min(col("__sts")))
      .withColumn("__b2",
        array_min(filter(col("__sts"),
          s => s.getField("cell") =!= col("__own").getField("cell")))
          .getField("d2"))
      .select(col("id"), col("__own").getField("cell").as("cell"),
        col("__own").getField("d2").as("__a2"), col("__b2"))
      .withColumn("__s",
        when(greatest(col("__a2"), col("__b2")) === 0, lit(0.0))
          .otherwise((sqrt(col("__b2").cast("double")) -
            sqrt(col("__a2").cast("double"))) /
            sqrt(greatest(col("__a2"), col("__b2")).cast("double"))))
    pts.groupBy("cell")
      .agg(count(lit(1)).cast("long").as("n"),
        (aggregate(
          array_sort(collect_list(struct(col("id"), col("__s").as("s")))),
          lit(0.0), (acc, e) => acc + e.getField("s")) / count(lit(1)))
          .as("mean_silhouette"))
  }
}
