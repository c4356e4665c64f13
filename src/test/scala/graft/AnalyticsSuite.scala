package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Properties for the round-8 analytics operators: single-scan moment
  * matrices, exact-integer PageRank, BM25, zone-map pruning reports,
  * temperature mixture allocation. Cross-engine value checks live in
  * the corpus oracle (q154–q160); these pin the plan shapes, the exact
  * arithmetic, and the invariants the oracle can't see. */
class AnalyticsSuite extends SparkTestBase {

  import spark.implicits._

  // --- Stats.corrMatrix ---------------------------------------------------

  test("corrMatrix: every pair from ONE parquet scan, values match per-pair corr") {
    val li = Tables.table(spark, sf0001, "lineitem")
    val cols = Seq("l_discount", "l_quantity", "l_tax")
    val m = Stats.corrMatrix(li, cols)
    val plan = m.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllMatchIn(plan).size
    assert(scans == 1, s"expected exactly 1 scan, got $scans in:\n$plan")
    val got = m.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (i <- cols.indices; j <- (i + 1) until cols.size) {
      val exp = li.stat.corr(cols(i), cols(j))
      val v = got((cols(i), cols(j)))
      assert(math.abs(exp - v) < 1e-9, s"${cols(i)}×${cols(j)}: $exp vs $v")
    }
  }

  // --- Components.pageRankExact -------------------------------------------

  test("pageRankExact matches an exact driver-side integer replay on a known graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val got = Components.pageRankExact(edges, "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // driver-side replay of the documented semantics, in exact Longs
    val sym = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val nodes = sym.map(_._1)
    val outdeg = sym.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val n = nodes.size.toLong
    val scale = 1000000L
    val teleport = (15L * scale) / (100L * n)
    var pr = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map { v =>
        v -> sym.toSeq.collect { case (u, `v`) => pr(u) / outdeg(u) }.sum
      }.toMap
      pr = nodes.map(v => v -> (teleport + (85L * in(v)) / 100L)).toMap
    }
    assert(got == pr, s"got=$got expected=$pr")
  }

  test("personalized pageRankExact: all-seeds ≡ classic, single seed replayed") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val allNodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val classic = Components.pageRankExact(edges, "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allSeeded = Components.pageRankExact(edges, "a", "b", iters = 3,
        seeds = Some(allNodes))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(allSeeded == classic, "seeding every node must be classic PageRank")

    val got = Components.pageRankExact(edges, "a", "b", iters = 3,
        seeds = Some(Seq(1L).toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side replay with the seed-conditional teleport/init
    val sym = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val nodes = sym.map(_._1)
    val outdeg = sym.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val scale = 1000000L
    val tp = (15L * scale) / 100L // one seed
    var pr = nodes.map(v => v -> (if (v == 1L) scale else 0L)).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map { v =>
        v -> sym.toSeq.collect { case (u, `v`) => pr(u) / outdeg(u) }.sum
      }.toMap
      pr = nodes.map(v =>
        v -> ((if (v == 1L) tp else 0L) + (85L * in(v)) / 100L)).toMap
    }
    assert(got == pr, s"got=$got expected=$pr")
    // rank mass concentrates at/near the seed
    assert(got(1L) > got(3L) && got(1L) > got(2L) && got(1L) > got(4L))
  }

  test("pageRankExact is partitioning-invariant and floor loss is bounded") {
    val edges = Tables.table(spark, sf0001, "lineitem")
      .filter(col("l_orderkey") < 500)
      .select((col("l_partkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
    val a = Components.pageRankExact(edges, "u", "v", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Components.pageRankExact(edges.repartition(7), "u", "v", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "integer PageRank must be bit-identical across partitionings")
    // floors only LOSE mass: total ≤ scale, and per iteration the loss is
    // < |E| (contribution floors) + 2n (damp + teleport floors)
    val n = a.size.toLong
    val e = edges.distinct().count() * 2
    val total = a.toSeq.map(_._2).sum
    assert(total <= 1000000L, s"mass grew: $total")
    assert(total >= 1000000L - 2 * (e + 2 * n) - n,
      s"lost too much mass: $total (n=$n, e=$e)")
  }

  // --- Indexing.bm25 ------------------------------------------------------

  test("bm25 matches a hand-computed reference with the sorted-fold order") {
    val docs = Seq(
      (1L, "spark data spark"),
      (2L, "data lake"),
      (3L, "fast spark engine here")).toDF("id", "text")
    val got = Indexing.bm25(docs, "id", "text", Seq("spark", "data"),
        k1 = 1.5, b = 0.75)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // replay the exact operator arithmetic (same op order, same fold order)
    val corpus = Map(1L -> Seq("spark", "data", "spark"),
      2L -> Seq("data", "lake"), 3L -> Seq("fast", "spark", "engine", "here"))
    val dl = corpus.map { case (d, ts) => d -> ts.size.toLong }
    val nd = corpus.size.toLong
    val avgdl = dl.values.sum.toDouble / nd
    val terms = Seq("spark", "data")
    val dfq = terms.map(t =>
      t -> corpus.count { case (_, ts) => ts.contains(t) }.toLong).toMap
    def score(d: Long): (Long, Double) = {
      val matched = terms.flatMap { t =>
        val tf = corpus(d).count(_ == t).toLong
        if (tf == 0) None else Some(t -> {
          // mirrors Exact.lnq — the idf is dyadically quantized in-op
          val idf = math.floor(math.log(1.0 +
            (nd - dfq(t) + 0.5) / (dfq(t) + 0.5)) * 67108864.0) / 67108864.0
          idf * (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * dl(d) / avgdl))
        })
      }.sortBy(_._1)
      (matched.size.toLong, matched.map(_._2).foldLeft(0.0)(_ + _))
    }
    Seq(1L, 2L, 3L).foreach { d =>
      val (en, es) = score(d)
      val (gn, gs) = got(d)
      assert(gn == en && math.abs(gs - es) < 1e-12, s"doc $d: $gs vs $es")
    }
    // doc 1 (two 'spark' hits + 'data', short) must outrank doc 2 and 3
    assert(got(1L)._2 > got(2L)._2 && got(1L)._2 > got(3L)._2)
  }

  test("bm25 score is partitioning-invariant (sorted fold kills IEEE order noise)") {
    val docs = Tables.table(spark, sf0001, "documents")
    val t = Seq("data", "fast", "spark")
    val a = Indexing.bm25(docs, "doc_id", "text", t, k1 = 1.5, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b2 = Indexing.bm25(docs.repartition(13), "doc_id", "text", t,
        k1 = 1.5, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b2, "bm25 must be bit-identical across partitionings")
  }

  // --- Layout.pruningReport -----------------------------------------------

  test("pruningReport: z-order reads fewer chunks than the natural sort for a box") {
    val li = Tables.table(spark, sf0001, "lineitem")
    val withz = Layout.withZ(li, "l_partkey", "l_suppkey", bits = 8)
    val rep = Layout.pruningReport(withz,
        Seq(("natural", col("l_orderkey")), ("zorder", col("z"))),
        chunks = 64, "l_partkey", "l_suppkey", 1L, 20L, 1L, 3L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, hitN, totalN, readN) = rep("natural")
    val (_, hitZ, totalZ, readZ) = rep("zorder")
    assert(totalN == totalZ, "both layouts must cover all rows")
    assert(hitZ < hitN,
      s"z-order should prune more: zorder hit $hitZ vs natural $hitN")
    // no false negatives: every matching row lives in a hit chunk
    val matching = li.filter(col("l_partkey").between(1, 20) &&
      col("l_suppkey").between(1, 3)).count()
    assert(readN >= matching && readZ >= matching,
      s"zone maps dropped matching rows: $readN/$readZ < $matching")
  }

  // --- Components.triangleCounts ------------------------------------------

  test("triangleCounts: K4 plus a pendant edge, any input orientation") {
    // K4 has 4 triangles; every K4 node sits in 3; the pendant node in 0
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 :+ ((4L, 5L))).toDF("a", "b")
    val got = Components.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got)
    // flipped + duplicated edges must not change the count
    val messy = edges.select(col("b").as("a"), col("a").as("b"))
      .unionAll(edges)
    val got2 = Components.triangleCounts(messy, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  // --- Quality.winsorize ---------------------------------------------------

  test("winsorize: clipped values inside [lo, hi], interior untouched, " +
      "clip fractions ≈ (pLo, 1-pHi)") {
    val li = Tables.table(spark, sf0001, "lineitem")
    val w = Quality.winsorize(li, "l_returnflag", "l_extendedprice",
      pLo = 0.1, pHi = 0.9).cache()
    assert(w.filter(col("l_extendedprice_w") < col("lo") ||
      col("l_extendedprice_w") > col("hi")).count() == 0)
    assert(w.filter(col("l_extendedprice").between(col("lo"), col("hi")) &&
      col("l_extendedprice_w") =!= col("l_extendedprice")).count() == 0)
    val frac = w.filter(col("l_extendedprice") < col("lo")).count().toDouble /
      w.count()
    assert(frac > 0.05 && frac < 0.15, s"lo-clip fraction $frac far from 0.1")
    w.unpersist()
  }

  // --- Funnel -------------------------------------------------------------

  test("funnel: greedy-earliest step times, gap cutoff, dropouts go NULL") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1 completes: signup 10:02 → click 10:05 → purchase 10:20
      (1L, "signup", ts(2)), (1L, "click", ts(5)), (1L, "purchase", ts(20)),
      // pre-signup click (10:01 < 10:02) must NOT count
      (1L, "click", ts(1)),
      // user 2 drops after click (purchase BEFORE the click: unreachable)
      (2L, "signup", ts(0)), (2L, "purchase", ts(3)), (2L, "click", ts(10)),
      // user 3 never signs up → absent from the funnel
      (3L, "click", ts(0))).toDF("user_id", "event_type", "ts")
    val f = graft.ops.Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))).toMap
    assert(f.keySet == Set(1L, 2L))
    assert(f(1L) == ((ts(2), ts(5), ts(20))))
    assert(f(2L) == ((ts(0), ts(10), null)))
    // with a 10-minute gap, user 1's purchase (15 min after click) drops
    val g = graft.ops.Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"), maxGap = Some("10 minutes"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(3)).toMap
    assert(g(1L) == null)
  }

  test("retention: cohorts by first-event day, distinct weekly actives") {
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val events = Seq(
      (1L, d(1)), (1L, d(2)), (1L, d(9)),   // cohort 1/1: w0 (twice), w1
      (2L, d(1)), (2L, d(16)),              // cohort 1/1: w0, w2
      (3L, d(9)), (3L, d(10))).toDF("user_id", "ts") // cohort 1/9: w0 only
    val r = graft.ops.Funnel.retention(events, "user_id", "ts")
      .collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) -> x.getLong(2)).toMap
    assert(r == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L,
      ("2024-01-01", 2) -> 1L, ("2024-01-09", 0) -> 1L), r)
  }

  // --- Funnel.transitions / Stats.welchT ----------------------------------

  test("transitions: deterministic sequence, counts exact, rows normalize") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, 10L, "a", ts(0)), (1L, 11L, "b", ts(1)), (1L, 12L, "a", ts(2)),
      // equal timestamps: event_id breaks the tie → c before b
      (2L, 20L, "a", ts(0)), (2L, 21L, "c", ts(1)), (2L, 22L, "b", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val t = graft.ops.Funnel.transitions(events, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(t.keySet == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "b")))
    assert(t(("a", "b"))._1 == 1L && t(("a", "c"))._1 == 1L)
    assert(t(("a", "b"))._2 == 0.5 && t(("c", "b"))._2 == 1.0)
    // per-from probabilities sum to 1 on the fixture corpus too
    val sums = graft.ops.Funnel.transitions(Tables.events(spark, sf0001),
        "user_id", "event_type", "ts", "event_id")
      .groupBy("from_type").agg(sum("p").as("sp")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, r))
  }

  test("welchT: one scan, identical cohorts give t ≈ 0, known shift detected") {
    val ev = Tables.events(spark, sf0001).filter(col("value").isNotNull)
    val w = Stats.welchT(ev, "event_type", col("user_id") % 2 === 0, "value")
    val scans = "Scan parquet".r
      .findAllMatchIn(w.queryExecution.executedPlan.toString).size
    assert(scans == 1, s"welchT must be a single-scan aggregation, got $scans")
    // planted shift: even uids at mean ~0, odd uids at mean ~5, tiny spread
    val planted = (1 to 200).map(i =>
      ("g", i.toLong * 2, (i % 7) * 0.01)) ++ (1 to 200).map(i =>
      ("g", i.toLong * 2 + 1, 5.0 + (i % 5) * 0.01))
    val p = Stats.welchT(planted.toDF("g", "uid", "v"), "g",
      col("uid") % 2 === 0, "v").head()
    val t = p.getAs[Double]("t")
    assert(math.abs(t) > 100, s"planted shift must be detected: t=$t")
    // identical value distributions in both cohorts → t exactly 0
    val sym = (1 to 400).map(i => ("g", i.toLong, ((i / 2) % 10).toDouble))
    val t2 = Stats.welchT(sym.toDF("g", "uid", "v"), "g",
      col("uid") % 2 === 0, "v").head().getAs[Double]("t")
    assert(math.abs(t2) < 1e-12, s"identical cohorts should give t = 0: $t2")
  }

  // --- Multimodal.imageNearDupPairs ----------------------------------------

  test("image dHash: re-encode invariant, small edits near, structure far") {
    import graft.ops.MediaCodec
    val a = MediaCodec.syntheticPng(64, 48, seed = 7, mix = 3)
    val ha = MediaCodec.dHash(a).get
    // identical pixels through a decode→re-encode round trip → same hash
    val re = MediaCodec.resizeImage(a, 64, 48).get
    assert(MediaCodec.dHash(re).get == ha, "re-encode must not move the hash")
    // small corner edit → within the pigeonhole radius
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    for (x <- 0 until 4; y <- 0 until 4) img.setRGB(x, y, 0xFFFFFF)
    val edited = MediaCodec.pngBytes(img)
    val he = MediaCodec.dHash(edited).get
    assert(java.lang.Long.bitCount(ha ^ he) <= 3,
      s"corner edit moved ${java.lang.Long.bitCount(ha ^ he)} bits")
    // structurally different image (checkerboard vs gradient) → far
    val cb = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 64; y <- 0 until 48)
      cb.setRGB(x, y, if ((x / 8 + y / 8) % 2 == 0) 0xFFFFFF else 0)
    val hc = MediaCodec.dHash(MediaCodec.pngBytes(cb)).get
    assert(java.lang.Long.bitCount(ha ^ hc) > 10,
      s"checkerboard only ${java.lang.Long.bitCount(ha ^ hc)} bits away")
    // non-image bytes have no hash
    assert(MediaCodec.dHash("not an image".getBytes).isEmpty)
  }

  test("imageNearDupPairs: planted copies found at Hamming 0, exact pairs") {
    import graft.ops.Multimodal
    val media = Multimodal.mediaFromDocuments(
      Tables.table(spark, sf0001, "documents"))
    val planted = media
      .filter((m: Multimodal.MediaRow) => m.kind == "image" && m.media_id < 60)
      .map((m: Multimodal.MediaRow) => m.copy(media_id = m.media_id + 1000000L))
    val pairs = Multimodal.imageNearDupPairs(media.union(planted), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val plantedIds = planted.collect().map(_.media_id - 1000000L).toSet
    assert(plantedIds.nonEmpty)
    // every planted copy pairs with its original at distance 0
    plantedIds.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 1000000L && p._3 == 0),
        s"planted copy of $id not found")
    }
    // and every reported pair really is within the radius
    assert(pairs.forall(_._3 <= 3))
  }

  // --- FuzzyJoin.overlapJoin -----------------------------------------------

  test("overlapJoin: prefix filter is lossless vs brute-force intersection") {
    val docs = Tables.table(spark, sf0001, "documents")
      .filter(col("doc_id") < 200).cache()
    val got = graft.ops.FuzzyJoin.overlapJoin(docs, "doc_id", "text", 28)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bt = docs.select(col("doc_id").as("ida"),
      filter(array_distinct(split(lower(col("text")), " ")), _ =!= "").as("ta"))
    val want = bt.alias("x").join(bt.withColumnRenamed("ida", "idb")
        .withColumnRenamed("ta", "tb").alias("y"),
        col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("ov"))
      .filter(col("ov") >= 28)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want,
      s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    assert(want.nonEmpty, "fixture subset should contain overlapping pairs")
    docs.unpersist()
  }

  // --- Stats.equiDepthHistogram --------------------------------------------

  test("equiDepthHistogram: full coverage, near-equal depths, ordered ranges") {
    val li = Tables.table(spark, sf0001, "lineitem")
    val h = Stats.equiDepthHistogram(li, "l_extendedprice", buckets = 8)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = li.count()
    assert(h.map(_._2).sum == total, "every row lands in exactly one bucket")
    assert(h.map(_._1).toSeq == (0 until 8), s"all 8 buckets present: $h")
    // equi-depth: each bucket within 25% of the ideal eighth (duplicates
    // at boundaries are the only source of imbalance)
    h.foreach { case (b, n, _, _) =>
      assert(math.abs(n - total / 8.0) < total * 0.25 / 8, s"bucket $b: $n")
    }
    // ranges are ordered and non-overlapping
    h.sliding(2).foreach { case Array((_, _, _, hi1), (_, _, lo2, _)) =>
      assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
    }
  }

  test("exactPercentiles: bit-identical to the builtin percentile() on " +
      "continuous, tied, tiny, and empty inputs (r17 distributed rewrite)") {
    import org.apache.spark.sql.functions.{col, percentile, typedLit}
    val li = Tables.table(spark, sf0001, "lineitem")
    val ps = (1 until 16).map(_.toDouble / 16).toArray
    def builtin(df: org.apache.spark.sql.DataFrame, c: String) = df
      .agg(percentile(col(c).cast("double"), typedLit(ps)).as("__bnds"))
      .head().getSeq[Double](0)
    def ours(df: org.apache.spark.sql.DataFrame, c: String) = {
      val r = Stats.exactPercentiles(df, col(c).cast("double"), ps).head()
      if (r.isNullAt(0)) null else r.getSeq[Double](0)
    }
    // near-continuous doubles (many distinct values, interpolation-heavy)
    assert(ours(li, "l_extendedprice") == builtin(li, "l_extendedprice"))
    // heavy ties (~50 distinct quantities; knots land inside tie runs)
    assert(ours(li, "l_quantity") == builtin(li, "l_quantity"))
    // tiny input: n < knot count forces repeated lower==higher keys
    val tiny = li.limit(5)
    assert(ours(tiny, "l_extendedprice") == builtin(tiny, "l_extendedprice"))
    // single row: every knot collapses to the one value
    val one = li.limit(1)
    assert(ours(one, "l_extendedprice") == builtin(one, "l_extendedprice"))
    // empty input: both return null boundaries
    val none = li.filter(col("l_quantity") < -1)
    assert(builtin(none, "l_extendedprice") == null)
    assert(ours(none, "l_extendedprice") == null)
  }

  test("global-percentile 100TB dials: approx mode stays within sketch " +
      "tolerance of exact (equiDepth, quantileNormalize, perplexityBuckets)") {
    val li = Tables.table(spark, sf0001, "lineitem")
    val total = li.count()
    // equi-depth: approx boundaries still cover every row with buckets
    // within 25% of ideal (same bound the exact test uses)
    val ha = Stats.equiDepthHistogram(li, "l_extendedprice", buckets = 8,
        exact = false)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(ha.map(_._2).sum == total)
    ha.foreach { case (b, n) =>
      assert(math.abs(n - total / 8.0) < total * 0.25 / 8, s"bucket $b: $n")
    }
    // quantileNormalize: approx knots shift normalized scores only
    // within a small fraction of the score range
    val docs = Tables.table(spark, sf0001, "documents")
    def qn(e: Boolean) = graft.ops.Quality
      .quantileNormalize(docs, "source", "n_chars", exact = e)
      .select(col("doc_id"), col("n_chars_qn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (qe, qa) = (qn(true), qn(false))
    val range = qe.values.max - qe.values.min
    val maxDrift = qe.map { case (k, v) => math.abs(qa(k) - v) }.max
    assert(maxDrift <= 0.05 * range, s"drift $maxDrift of range $range")
    // perplexityBuckets: approx thresholds relabel only rows near the
    // tercile edges (< 5% of the corpus on the fixture)
    val scored = docs.select(col("doc_id"),
      (col("n_chars") % 997).cast("double").as("score"))
    def buckets(e: Boolean) = graft.ops.Lm
      .perplexityBuckets(scored, exact = e)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("bucket")).toMap
    val (be, ba) = (buckets(true), buckets(false))
    val moved = be.count { case (k, v) => ba(k) != v }
    assert(moved <= be.size / 20, s"$moved of ${be.size} relabeled")
  }

  // --- Sampling.temperatureAllocation -------------------------------------

  test("temperatureAllocation: sums to budget, endpoints and monotonicity hold") {
    val df = (Seq.fill(100)("big") ++ Seq.fill(50)("mid") ++
      Seq.fill(10)("small") ++ Seq.fill(1)("tiny"))
      .zipWithIndex.toDF("src", "i")
    def alloc(alpha: Double): Map[String, Long] =
      Sampling.temperatureAllocation(df, "src", alpha, 1000L)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val a0 = alloc(0.0); val aHalf = alloc(0.5); val a1 = alloc(1.0)
    Seq(a0, aHalf, a1).foreach(a => assert(a.values.sum == 1000L, a))
    // α = 0: uniform
    assert(a0.values.toSet == Set(250L), a0)
    // α = 1: proportional (1000·n/161, largest-remainder)
    assert(a1("big") == 621L && a1("mid") == 311L &&
      a1("small") == 62L && a1("tiny") == 6L, a1)
    // monotone in n at every α; temperature compresses the big:small gap
    Seq(a0, aHalf, a1).foreach { a =>
      assert(a("big") >= a("mid") && a("mid") >= a("small") &&
        a("small") >= a("tiny"), a)
    }
    assert(aHalf("big") < a1("big") && aHalf("tiny") > a1("tiny"),
      s"α=0.5 should shift budget from big to tiny: $aHalf vs $a1")
  }

  // --- Stats.rocAuc / calibrationBins -------------------------------------

  test("rocAuc: hand-computed values, separation endpoints, tie half-credit") {
    def auc(rows: Seq[(Double, Boolean)]): Double =
      Stats.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head.getDouble(3)
    // perfect separation
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true)))
      == 1.0)
    // inverted
    assert(auc(Seq((3.0, false), (4.0, false), (1.0, true), (2.0, true)))
      == 0.0)
    // tie: pos {1,2}, neg {2,3} → U = 0.5 → AUC = 0.125
    assert(auc(Seq((1.0, true), (2.0, true), (2.0, false), (3.0, false)))
      == 0.125)
    // all-tied degenerates to exactly one half
    assert(auc(Seq((5.0, true), (5.0, false), (5.0, true), (5.0, false)))
      == 0.5)
  }

  test("rocAuc: grouped result equals per-slice global computation") {
    val ev = Tables.table(spark, sf0001, "events")
    val pos = col("event_type") === "purchase"
    val grouped = Stats.rocAuc(ev, col("value"), pos, Seq("event_type"))
    assert(grouped.collect().isEmpty == false)
    val byLang = Stats.rocAuc(
        ev.withColumn("g", (col("user_id") % 2).cast("string")),
        col("value"), pos, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    Seq("0", "1").foreach { g =>
      val slice = Stats.rocAuc(
        ev.filter((col("user_id") % 2).cast("string") === g),
        col("value"), pos).collect().head.getDouble(3)
      assert(byLang(g) == slice, s"group $g: ${byLang(g)} vs $slice")
    }
  }

  test("calibrationBins: clamped edges, exact counts and rates") {
    val rows = Seq((10.0, true), (60.0, false), (120.0, true),
      (499.0, false), (-5.0, true), (60.5, true))
      .toDF("s", "y")
    val got = Stats.calibrationBins(rows, col("s"), col("y"),
        bins = 8, lo = 0.0, hi = 400.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) == ((2L, 2L, 1.0)))           // 10 and clamped -5
    assert(got(1L) == ((2L, 1L, 0.5)))           // 60, 60.5
    assert(got(2L) == ((1L, 1L, 1.0)))           // 120
    assert(got(7L) == ((1L, 0L, 0.0)))           // clamped 499
  }

  // --- Stats.chiSquared ---------------------------------------------------

  test("chiSquared: 2x2 closed form, exact zero under perfect independence") {
    def expand(cells: Seq[(String, String, Int)]) =
      cells.flatMap { case (a, b, k) => Seq.fill(k)((a, b)) }.toDF("a", "b")
    val got = Stats.chiSquared(
      expand(Seq(("x", "u", 10), ("x", "v", 20), ("y", "u", 30),
        ("y", "v", 40))), "a", "b").collect().head
    // closed form: n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    val want = 100.0 * math.pow(10 * 40 - 20 * 30, 2) /
      (30.0 * 70.0 * 40.0 * 60.0)
    assert(math.abs(got.getDouble(0) - want) < 1e-12,
      s"chi2 ${got.getDouble(0)} vs $want")
    assert(got.getLong(1) == 1L && got.getLong(2) == 100L)
    assert(math.abs(got.getDouble(3) -
      math.sqrt(got.getDouble(0) / 100.0)) < 1e-15)
    // perfectly independent 2x3 (marginal products are integral): chi2 = 0
    val indep = Stats.chiSquared(
      expand(Seq(("x", "u", 2), ("x", "v", 4), ("x", "w", 6),
        ("y", "u", 1), ("y", "v", 2), ("y", "w", 3))), "a", "b")
      .collect().head
    assert(indep.getDouble(0) == 0.0 && indep.getLong(1) == 2L)
    assert(indep.getDouble(3) == 0.0)
  }

  test("chiSquared: ONE raw scan; windows run over the cell table only") {
    val orders = Tables.table(spark, sf0001, "orders")
    val plan = Stats.chiSquared(orders, "o_orderstatus", "o_orderpriority")
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllMatchIn(plan).size
    assert(scans == 1, s"expected 1 raw scan, got $scans:\n$plan")
  }

  // --- Association.liftPairs ----------------------------------------------

  test("liftPairs: hand-computed support/confidence/lift; duplicates collapse") {
    // 4 baskets; x,y always together (lift 2); a independent of x
    val rows = Seq(
      (1, "x"), (1, "y"), (1, "a"), (1, "x"), // dup x collapses
      (2, "x"), (2, "y"),
      (3, "a"),
      (4, "a"), (4, "b")).toDF("basket", "item")
    val got = Association.liftPairs(rows, Seq("basket"), "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    // x,y: c_ab=2, c_x=2, c_y=2, N=4 → conf 1.0, lift 2.0
    assert(got(("x", "y")) == ((2L, 1.0, 2.0)), got)
    // a,x: c_ab=1, c_a=3, c_x=2 → conf 1/3, lift 4/6
    val (c, conf, lift) = got(("a", "x"))
    assert(c == 1L && conf == 1.0 / 3.0 && lift == 4.0 / 6.0, got)
  }

  test("liftPairs maxBasket: cap>=basket is identity; capped basket " +
      "pair fan-out bounded; deterministic across layouts") {
    val bot = (1 to 40).map(i => (9, s"i$i"))
    val rows = (Seq((1, "x"), (1, "y"), (2, "x"), (2, "y")) ++ bot)
      .toDF("basket", "item")
    def run(df: org.apache.spark.sql.DataFrame, cap: Int) =
      Association.liftPairs(df, Seq("basket"), "item", maxBasket = cap)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getLong(2)).toMap
    assert(run(rows, 1000) == run(rows.toDF("basket", "item"),
      Int.MaxValue))
    val capped = run(rows, 5)
    // bot basket contributes C(5,2)=10 pairs, not C(40,2)=780;
    // the uncapped 2-item baskets are untouched
    assert(capped(("x", "y")) == 2L)
    assert(capped.count { case ((a, b), _) =>
      a.startsWith("i") && b.startsWith("i") } == 10, capped.size)
    assert(run(rows.repartition(7), 5) == capped)
  }

  // --- Dedup.sortedNeighborPairs ------------------------------------------

  test("sortedNeighborPairs: equals the brute-force rank-window definition; partition-invariant") {
    val docs = Tables.table(spark, sf0001, "documents")
    val key = substring(lower(col("text")), 1, 24)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Dedup.sortedNeighborPairs(df, "doc_id", key, window = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = pairs(docs)
    assert(pairs(docs.repartition(3)) == got,
      "pair set must not depend on input partitioning")
    // brute force from the definition
    val ranked = docs.select(col("doc_id"), key.as("k")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => (id, i + 1) }
    val want = (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb > ra && rb <= ra + 3
    } yield (a, b, (rb - ra).toLong)).toSet
    assert(got == want, s"got ${got.size} vs want ${want.size}")
    // every pair appears exactly once (the band duplication can't double)
    val multi = Dedup.sortedNeighborPairs(docs, "doc_id", key, 3)
      .groupBy("a", "b").count().filter(col("count") > 1).count()
    assert(multi == 0, "banded join must emit each pair exactly once")
  }

  // --- Quality.quantileNormalize ------------------------------------------

  test("quantileNormalize: endpoints map to global min/max, ranks monotone, sources aligned") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "source", "n_chars")
    val qn = Quality.quantileNormalize(docs, "source", "n_chars")
    val rows = qn.collect().map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_chars"), r.getAs[Double]("pct"),
      r.getAs[Double]("n_chars_qn")))
    val (gmin, gmax) = (rows.map(_._2).min.toDouble, rows.map(_._2).max.toDouble)
    rows.foreach { case (src, _, p, v) =>
      assert(p >= 0 && p <= 1)
      assert(v >= gmin - 1e-9 && v <= gmax + 1e-9, s"$src $v outside global")
      if (p == 0.0) assert(v == gmin, s"p=0 must map to the global min, got $v")
      if (p == 1.0) assert(v == gmax, s"p=1 must map to the global max, got $v")
    }
    // within a source, normalized scores are monotone in the raw score
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.sortBy(_._2).map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a <= b + 1e-12)
        case _           =>
      }
    }
    // after normalization every source's median sits near the global
    // median (that is the point of the calibration)
    val gMed = rows.map(_._4).sorted.apply(rows.length / 2)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val m = rs.map(_._4).sorted.apply(rs.length / 2)
      assert(math.abs(m - gMed) / math.max(gMed.abs, 1.0) < 0.25,
        s"$src median $m vs global $gMed")
    }
  }

  // --- Sampling.temporalSplit / TextAnalysis.pmi + zipf -------------------

  test("temporalSplit: microsecond-exact boundaries, embargo dropped from both") {
    val cut = "2024-01-20 00:00:00"
    val rows = Seq(
      ("at_cut", java.sql.Timestamp.valueOf("2024-01-20 00:00:00")),
      ("in_embargo", java.sql.Timestamp.valueOf("2024-01-20 12:00:00")),
      ("at_embargo_end", java.sql.Timestamp.valueOf("2024-01-21 00:00:00")),
      ("after", new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-21 00:00:00").getTime + 1)))
      .toDF("tag", "ts")
    val got = Sampling.temporalSplit(rows, "ts", cut, 86400L)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got == Map("at_cut" -> "train", "in_embargo" -> "embargo",
      "at_embargo_end" -> "embargo", "after" -> "test"), got)
  }

  test("pmiCollocations: independence near 0, perfect co-occurrence = ln(N/df)") {
    // 8 docs: 'x y' always together in 4 docs; 'a' and 'b' independent
    val docs = Seq(
      (1L, "x y a"), (2L, "x y b"), (3L, "x y a b"), (4L, "x y"),
      (5L, "a"), (6L, "b"), (7L, "a b"), (8L, "c")).toDF("doc_id", "text")
    val vocab = Seq("x", "y", "a", "b", "c").toDF("token")
    val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text", vocab,
        minPairDocs = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // x and y: df 4 each, together 4 of 8 → pmi = ln(4·8/16) = ln 2
    assert(got(("x", "y"))._1 == 4L)
    assert(math.abs(got(("x", "y"))._2 - math.log(2.0)) < 1e-6)
    // a and b: df 4 each, together 2 of 8 → pmi = ln(16/16) = 0
    assert(got(("a", "b")) == ((2L, 0.0)))
  }

  test("zipfSlope: matches a driver-side replay; partitioning-invariant") {
    val docs = Tables.table(spark, sf0001, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.zipfSlope(df, "text", "source")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
    val got = run(docs)
    assert(run(docs.repartition(7)) == got, "must be partitioning-invariant")
    // driver-side replay for one source
    val src = got.keySet.head
    val freqs = docs.filter(col("source") === src)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, f) => (-f, t) }.take(2000)
    val xy = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.log10((i + 1).toDouble), math.log10(f.toDouble)) }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(got(src)._2 - slope) < 1e-5,
      s"$src: ${got(src)._2} vs $slope")
    // a natural-ish corpus should slope downward
    got.values.foreach { case (_, s) => assert(s < 0, got) }
  }

  // --- Resample.ewma ------------------------------------------------------

  test("ewma: seeded recurrence known answer, dyadic-exact, partitioning-invariant") {
    val rows = Seq((1L, 1, 4.0), (1L, 2, 8.0), (1L, 3, 16.0), (2L, 1, 7.0))
      .toDF("k", "ts", "x")
    def run(df: org.apache.spark.sql.DataFrame) =
      Resample.ewma(df, "k", "ts", "x")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    val got = run(rows)
    // y1=4; y2=0.5*4+0.5*8=6; y3=0.5*6+0.5*16=11 — exact dyadic steps
    assert(got(1L) == ((3L, 11.0)), got)
    assert(got(2L) == ((1L, 7.0)), "single observation seeds and returns")
    assert(run(rows.repartition(5)) == got, "must be partitioning-invariant")
  }

  // --- Components.kCore ---------------------------------------------------

  test("kCore: cascading peel on a known graph; orientation-invariant") {
    // triangle {1,2,3} + a path 3-4-5 hanging off: the 2-core is exactly
    // the triangle, and node 4 (degree 2 initially) peels only AFTER 5
    // goes — the cascade a one-shot degree filter misses
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = Components.kCore(edges.toDF("a", "b"), "a", "b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), got)
    // flipped orientation, same result
    val flipped = Components.kCore(
      edges.map(_.swap).toDF("a", "b"), "a", "b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flipped == got)
    // k above the max degree: empty core
    assert(Components.kCore(edges.toDF("a", "b"), "a", "b", k = 5)
      .collect().isEmpty)
    // fixture graph converges within the oracle's 10 unrolled rounds and
    // the result is the exact driver-side fixed point
    val j = Tables.table(spark, sf0001, "orders")
      .join(Tables.table(spark, sf0001, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_quantity") >= 30)
      .select((col("o_custkey") * 2).as("u"), (col("l_partkey") * 2 + 1).as("v"))
    val core = Components.kCore(j, "u", "v", k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = j.collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (u, v) => Seq(u -> v, v -> u) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var surv = adj.keySet
    var it = 0
    var stable = false
    while (!stable && it <= 10) {
      val next = surv.filter(u => (adj(u) & surv).size >= 8)
      stable = next == surv; surv = next; it += 1
    }
    assert(stable, "fixture peel must converge within 10 rounds")
    assert(core == surv.map(u => u -> (adj(u) & surv).size.toLong).toMap)
  }

  // --- Layout.withHilbertCode ---------------------------------------------

  test("hilbert: first-order known answer, bijection + no-jump adjacency at 8x8") {
    def grid(bits: Int) = {
      val n = 1 << bits
      val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y)
      Layout.withHilbertCode(cells.toDF("x", "y"), col("x"), col("y"), bits)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
    }
    // the canonical 2x2 U: (0,0)→0 (0,1)→1 (1,1)→2 (1,0)→3
    assert(grid(1).toMap == Map((0, 0) -> 0L, (0, 1) -> 1L,
      (1, 1) -> 2L, (1, 0) -> 3L))
    // 8x8: indexes are a bijection onto 0..63 and the walk never jumps
    val g3 = grid(3)
    assert(g3.map(_._2).sorted.toSeq == (0L until 64L), "not a bijection")
    val byD = g3.sortBy(_._2).map(_._1)
    byD.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d-consecutive cells ($x1,$y1)→($x2,$y2)")
    }
  }

  test("hilbert: zero-shuffle projection; prunes better than the natural order") {
    val li = Tables.table(spark, sf0001, "lineitem")
    val withh = Layout.withH(li, "l_partkey", "l_suppkey", bits = 8)
    val plan = withh.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hilbert code must not shuffle:\n$plan")
    val rep = Layout.pruningReport(withh,
        Seq(("hilbert", col("h")), ("natural", col("l_orderkey"))),
        chunks = 64, "l_partkey", "l_suppkey", 1L, 40L, 1L, 4L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rep("hilbert") < rep("natural"),
      s"hilbert must read fewer rows for the box: $rep")
  }

  // --- Projection.randomProjection ----------------------------------------

  test("randomProjection: sign family matches the SQL-expression replay") {
    val probes = for (i <- Seq(0, 1, 7, 63); j <- Seq(0, 3, 7)) yield (i, j)
    val viaSql = probes.toDF("i", "j")
      .withColumn("s", when(
        expr("CAST(conv(substring(md5(concat_ws('_', 'jl', i, j)), 1, 1)," +
          " 16, 10) AS BIGINT) % 2") === 0, 1.0).otherwise(-1.0))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    probes.foreach { case (i, j) =>
      assert(Projection.sign("jl", i, j) == viaSql((i, j)), s"($i,$j)")
    }
  }

  test("randomProjection: partitioning-invariant bits, norms preserved in expectation") {
    val emb = Tables.table(spark, sf0001, "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) =
      Projection.randomProjection(df, "vec_id", "embedding", 64, 8)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    val a = run(emb)
    val b = run(emb.repartition(7))
    assert(a == b, "projection must be bit-identical under repartitioning")
    // E||y||^2 = outDim * ||x||^2 for +-1 signs: the mean ratio over the
    // corpus concentrates near 1
    val normIn = emb.select(col("vec_id"),
        aggregate(transform(col("embedding"),
          x => x.cast("double") * x.cast("double")),
          lit(0.0), (s, t) => s + t).as("n2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ratios = a.groupBy(_._1._1).map { case (id, _) =>
      val y2 = (0 until 8).map(j => a((id, j.toLong))).map(y => y * y).sum
      y2 / (8.0 * normIn(id))
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean")
  }

  // --- Rollup -------------------------------------------------------------

  private def rollupMeasures = Seq(
    Rollup.Measure.rowCount("n"),
    Rollup.Measure.sumOf("s", expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")),
    Rollup.Measure.minOf("lo", col("o_totalprice")),
    Rollup.Measure.maxOf("hi", col("o_totalprice")))

  private def rollupRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

  test("rollup: any split and any merge order ≡ full recompute") {
    val orders = Tables.table(spark, sf0001, "orders")
    val keys = Seq("o_custkey"); val ms = rollupMeasures
    val full = rollupRows(Rollup.aggregate(orders, keys, ms))
    val parts = (0 until 3).map(i =>
      Rollup.aggregate(orders.filter(col("o_orderkey") % 3 === i), keys, ms))
    val leftFold = Rollup.merge(
      Rollup.merge(parts(0), parts(1), keys, ms), parts(2), keys, ms)
    val revFold = Rollup.merge(parts(2),
      Rollup.merge(parts(1), parts(0), keys, ms), keys, ms)
    assert(rollupRows(leftFold) == full)
    assert(rollupRows(revFold) == full)
    // raw-delta convenience path too
    val viaRaw = Rollup.mergeRaw(
      Rollup.aggregate(orders.filter(col("o_orderkey") % 2 === 0), keys, ms),
      orders.filter(col("o_orderkey") % 2 =!= 0), keys, ms)
    assert(rollupRows(viaRaw) == full)
  }

  test("rollup: delta merge shuffles state tables, not raw history") {
    val orders = Tables.table(spark, sf0001, "orders")
    val keys = Seq("o_custkey"); val ms = rollupMeasures
    val standing = Rollup.aggregate(orders, keys, ms)
      .localCheckpoint(true) // materialized state table: no raw lineage
    val delta = orders.filter(col("o_orderkey") % 97 === 0)
    val plan = Rollup.mergeRaw(standing, delta, keys, ms)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllMatchIn(plan).size
    assert(scans == 1, s"merge must rescan only the delta, got $scans scans")
  }

  test("rollup: HLL sketch measure unions losslessly across batches") {
    val orders = Tables.table(spark, sf0001, "orders")
    val keys = Seq("o_orderpriority")
    val ms = Seq(Rollup.Measure.approxDistinct("d", col("o_custkey")))
    def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col(keys.head), Rollup.Measure.estimate(col("d")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = estimates(Rollup.aggregate(orders, keys, ms))
    val merged = Rollup.merge(
      Rollup.aggregate(orders.filter(col("o_orderkey") % 2 === 0), keys, ms),
      Rollup.aggregate(orders.filter(col("o_orderkey") % 2 =!= 0), keys, ms),
      keys, ms)
    assert(estimates(merged) == full,
      "union of per-batch sketches must estimate exactly like the " +
        "single-pass sketch")
    // and the sketch estimate tracks the exact distinct count
    val exact = orders.groupBy(keys.head)
      .agg(countDistinct("o_custkey").as("x")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (k, est) =>
      val x = exact(k)
      assert(math.abs(est - x).toDouble / x < 0.05, s"$k: est $est exact $x")
    }
  }

  test("rollup: HLL determinism boundary — exact-mode layout-invariant, " +
      "dense-mode tolerance-bounded (why q178 stays rows-only)") {
    // q178 promotion attempt (VERDICT r9 item 7), measured results:
    //  (a) sketch BYTES are not layout-invariant (list/set→dense promotion
    //      happens at per-partition insertion-order-dependent points), and
    //  (b) once DENSE, even the ESTIMATE differs across partition layouts
    //      (±1% observed at ~2.8k distincts, lgK=12): the union's HIP
    //      accumulator depends on merge order.
    // So there is NO hashable register/estimate surface at real scale —
    // the precise reason q178 is declared rows-only. What this pins
    // instead: below the set-mode threshold the sketch counts EXACTLY and
    // is layout-invariant; dense estimates stay within the ±5% band
    // regardless of layout. Synthetic input: fixture-regeneration-proof.
    val ms = Seq(Rollup.Measure.approxDistinct("d", col("v")))
    def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("k"), Rollup.Measure.estimate(col("d")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact (list/set) mode: ≤ 300 distincts per key
    val small = spark.range(20000)
      .select((col("id") % 7).cast("string").as("k"),
        (col("id") * 2654435761L % 300L).as("v"))
    val smallByLayout = Seq(1, 7, 32).map(p =>
      estimates(Rollup.aggregate(small.repartition(p), Seq("k"), ms)))
    assert(smallByLayout.distinct.size == 1 &&
      smallByLayout.head.values.forall(_ == 300L),
      s"set-mode sketches must count exactly on any layout: $smallByLayout")
    // dense mode: ~2.3k distincts per key — layout changes the estimate,
    // but every layout stays within the HLL error band of the exact count
    val big = spark.range(20000)
      .select((col("id") % 7).cast("string").as("k"),
        (col("id") * 2654435761L % 6007L).as("v"))
    val exact = big.groupBy("k").agg(countDistinct("v").as("x")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 7, 32).foreach { p =>
      estimates(Rollup.aggregate(big.repartition(p), Seq("k"), ms))
        .foreach { case (k, est) =>
          assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
            s"layout $p key $k: est $est exact ${exact(k)}")
        }
    }
  }

  // --- Survival.kaplanMeier -----------------------------------------------

  test("kaplanMeier: textbook product-limit on a hand-computed cohort") {
    // durations (t, observed): deaths at 2 (×2), 4; censored at 3, 5
    val subj = Seq((2L, true), (2L, true), (3L, false), (4L, true),
      (5L, false)).toDF("dur", "obs")
    val got = Survival.kaplanMeier(subj, "dur", "obs", Seq.empty)
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    // t=2: n=5, d=2 → S=0.6; t=4: n=2 (3 censored, one at 3) → d=1 → S=0.3
    assert(got.toSeq == Seq((2L, 2L, 5L, 0.6), (4L, 1L, 2L, 0.6 * 0.5)),
      got.mkString(", "))
  }

  test("kaplanMeier: survival is nonincreasing and censoring only slows decline") {
    val lt = Survival.userLifetimes(Tables.events(spark, sf0001),
      "user_id", "ts", quietUs = 43200000000L)
    val curve = Survival.kaplanMeier(lt, "duration_days", "observed",
      Seq.empty).orderBy("t").collect()
    assert(curve.nonEmpty, "fixture cohort must produce a curve")
    val s = curve.map(_.getDouble(4))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-15 },
      s"survival must be nonincreasing: ${s.mkString(",")}")
    // all-observed (no censoring) KM at the last death time equals the
    // empirical survivor fraction — the estimator's defining identity
    val all = lt.withColumn("observed", lit(true))
    val kmAll = Survival.kaplanMeier(all, "duration_days", "observed",
      Seq.empty).orderBy(col("t").desc).limit(1).collect()(0)
    assert(math.abs(kmAll.getDouble(4)) < 1e-12,
      s"uncensored KM must hit 0 at the max duration, got $kmAll")
  }

  // --- Stats.ols2 ---------------------------------------------------------

  test("ols2: recovers planted coefficients exactly on a noiseless design") {
    // y = 7 + 3·x1 − 2·x2 over a non-collinear integer grid
    val rows = for (a <- 0L to 9L; b <- 0L to 9L if a != b)
      yield (a, b, 7L + 3L * a - 2L * b)
    val df = rows.toDF("x1", "x2", "y")
    val r = Stats.ols2(df, col("x1"), col("x2"), col("y")).collect()(0)
    assert(r.getLong(0) == rows.size)
    assert(math.abs(r.getDouble(1) - 7.0) < 1e-9, s"b0=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-9, s"b1=${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) + 2.0) < 1e-9, s"b2=${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12, s"r2=${r.getDouble(4)}")
  }

  test("ols2: collinear design yields NULL coefficients, not an ANSI error") {
    val df = Seq((1L, 2L, 5L), (2L, 4L, 7L), (3L, 6L, 9L)).toDF("x1", "x2", "y")
    val r = Stats.ols2(df, col("x1"), col("x2"), col("y")).collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3), s"expected NULL b1/b2: $r")
  }

  test("ols2: bit-identical under repartitioning (order-free decimal sums)") {
    val li = Tables.table(spark, sf0001, "lineitem")
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.ols2(df, floor(col("l_quantity")).cast("long"),
        floor(col("l_discount") * 100).cast("long"),
        floor(col("l_extendedprice") * 100).cast("long")).collect()(0)
    val a = run(li); val b = run(li.repartition(17, col("l_partkey")))
    assert(a == b, s"$a vs $b")
  }

  // --- Stats.acf ----------------------------------------------------------

  test("acf: known series matches a driver-side exact replay") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("k", "ts", "x")
    val got = Stats.acf(df, "k", "ts", col("x"), maxLag = 3, tieCol = "ts")
      .collect()(0)
    def ref(j: Int): Double = {
      val n = xs.size
      val m = xs.sum
      val c = xs.dropRight(j).zip(xs.drop(j)).map { case (a, b) => a * b }.sum
      val aj = xs.dropRight(j).sum; val bj = xs.drop(j).sum
      val num = n.toLong * n * c - n * m * (aj + bj) + (n - j) * m * m
      val den = n.toLong * n * xs.map(x => x * x).sum - n * m * m
      num.toDouble / den.toDouble
    }
    (1 to 3).foreach { j =>
      assert(math.abs(got.getDouble(1 + j) - ref(j)) < 1e-12,
        s"lag $j: ${got.getDouble(1 + j)} vs ${ref(j)}")
    }
  }

  test("acf: constant series → NULL (zero variance); short series → NULL lags") {
    val const = Seq((1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 5L))
      .toDF("k", "ts", "x")
    val r = Stats.acf(const, "k", "ts", col("x"), 3, "ts").collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), s"$r")
    val short = Seq((1L, 1L, 2L), (1L, 2L, 7L)).toDF("k", "ts", "x")
    val r2 = Stats.acf(short, "k", "ts", col("x"), 3, "ts").collect()(0)
    assert(!r2.isNullAt(2) && r2.isNullAt(3) && r2.isNullAt(4),
      s"n=2 has lag-1 only: $r2")
  }

  // --- Funnel.sessionMotifs -----------------------------------------------

  test("sessionMotifs: hand-built sessions classify correctly, ONE aggregation") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Long) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // user 1: [view view purchase] then (gap) [error view error];
    // user 2: [signup]
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "view"),
      (1L, ts(2), 3L, "purchase"),
      (1L, ts(120), 4L, "error"), (1L, ts(121), 5L, "view"),
      (1L, ts(122), 6L, "error"),
      (2L, ts(0), 7L, "signup")).toDF("user_id", "ts", "event_id",
      "event_type")
    val sess = Sessionize.sessionize(ev, "user_id", "ts", "event_id", 1800L)
    val got = Funnel.sessionMotifs(sess, "user_id", "session_seq",
        "event_type", "ts", "event_id",
        Seq("err" -> "e.+e", "buy" -> "v.*p", "first" -> "^s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got("err") == ((1L, 3L, 1.0 / 3)), got.toString)
    assert(got("buy") == ((1L, 3L, 1.0 / 3)), got.toString)
    assert(got("first") == ((1L, 3L, 1.0 / 3)), got.toString)
  }

  // --- Stats.twoProportionZ -----------------------------------------------

  test("twoProportionZ: hand-computed pooled z; degenerate arms → NULL") {
    // arm A: 60/100, arm B: 45/100
    val rows = (0 until 100).map(i => (true, i < 60)) ++
      (0 until 100).map(i => (false, i < 45))
    val df = rows.toDF("arm", "succ")
    val r = Stats.twoProportionZ(df, col("arm"), col("succ")).collect()(0)
    val p = 105.0 / 200
    val se = math.sqrt(p * (1 - p) * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(r.getDouble(6) - (0.60 - 0.45) / se) < 1e-12, s"$r")
    val solo = Seq((true, true), (true, false)).toDF("arm", "succ")
    val r2 = Stats.twoProportionZ(solo, col("arm"), col("succ")).collect()(0)
    assert(r2.isNullAt(5) && r2.isNullAt(6), s"empty arm must NULL p2/z: $r2")
  }

  // --- Stats.gini ---------------------------------------------------------

  test("gini: known answers — perfect equality 0, full concentration → (n-1)/n") {
    val eq = Seq.fill(8)(5L).zipWithIndex.map { case (x, i) => ("g", x) }
      .toDF("g", "x")
    val g1 = Stats.gini(eq, "g", col("x")).collect()(0)
    assert(g1.getDouble(3) == 0.0, g1.toString)
    val conc = (Seq.fill(9)(0L) :+ 100L).map(("g", _)).toDF("g", "x")
    val g2 = Stats.gini(conc, "g", col("x")).collect()(0)
    assert(math.abs(g2.getDouble(3) - 0.9) < 1e-12, g2.toString)
    // hand case: {1,2,3,4} → G = (2·(1+4+9+16) − 5·10)/(4·10) = 10/40
    val h = Seq(("g", 3L), ("g", 1L), ("g", 4L), ("g", 2L)).toDF("g", "x")
    val g3 = Stats.gini(h, "g", col("x")).collect()(0)
    assert(math.abs(g3.getDouble(3) - 0.25) < 1e-12, g3.toString)
  }

  test("gini: tie-order invariant and partitioning-invariant") {
    val li = Tables.table(spark, sf0001, "lineitem")
    val x = floor(col("l_quantity")).cast("long") // heavy ties: 50 values
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.gini(df, "l_returnflag", x).orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(run(li) == run(li.repartition(13, col("l_orderkey"))),
      "equal-value rank permutations must not change the sum")
  }

  // --- Components.labelPropagation ----------------------------------------

  test("labelPropagation: two cliques with a bridge settle into two communities") {
    // K4 {1..4} + K4 {11..14}, bridged by (4, 11)
    def k4(off: Long) = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a + off, b + off)
    val edges = (k4(0) ++ k4(10) :+ (4L, 11L)).toDF("a", "b")
    val got = Components.labelPropagation(edges, "a", "b", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = Set(1L, 2L, 3L).map(got)
    val c2 = Set(12L, 13L, 14L).map(got)
    assert(c1.size == 1 && c2.size == 1, s"cliques must be uniform: $got")
    assert(c1 != c2, s"distinct communities expected: $got")
  }

  test("labelPropagation: deterministic under repartitioning; round-1 = min neighbor") {
    val li = Tables.table(spark, sf0001, "lineitem")
      .filter(col("l_orderkey") < 500)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
    def run(df: org.apache.spark.sql.DataFrame, it: Int) =
      Components.labelPropagation(df, "a", "b", it).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(li, 3) == run(li.repartition(11, col("a")), 3))
    // round 1: every neighbor label is distinct (node ids), so all counts
    // tie at 1 and the (count DESC, label ASC) rule picks the min neighbor
    val one = run(li, 1)
    val adj = li.select(col("a").cast("long"), col("b").cast("long"))
      .collect().flatMap(r => Seq(r.getLong(0) -> r.getLong(1),
        r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).min }
    assert(one == adj, "round-1 label must be the minimum neighbor id")
  }

  // --- Drift.jsDivergence ---------------------------------------------------

  test("jsDivergence: identical → 0, disjoint → ln 2, symmetric, bounded") {
    val a = Seq("x", "x", "y", "z").toDF("t")
    val b = Seq("x", "y", "y", "z").toDF("t")
    val same = Drift.jsDivergence(a, a, "t").collect()(0)
    assert(same.getDouble(0) == 0.0, same.toString)
    val dis = Drift.jsDivergence(Seq("p", "q").toDF("t"),
      Seq("r", "s").toDF("t"), "t").collect()(0)
    // quantized ln: within 2^-26 of ln 2
    assert(math.abs(dis.getDouble(0) - math.log(2)) < 1e-7, dis.toString)
    val ab = Drift.jsDivergence(a, b, "t").collect()(0).getDouble(0)
    val ba = Drift.jsDivergence(b, a, "t").collect()(0).getDouble(0)
    assert(math.abs(ab - ba) < 1e-9 && ab > 0 && ab < math.log(2),
      s"js(a,b)=$ab js(b,a)=$ba")
  }

  // --- Quality.benford ------------------------------------------------------

  test("benford: exact counts, shares sum to 1, genuine multi-magnitude data fits") {
    // 1..999 uniform: every leading digit d has 1 + 10 + 100 = 111 values
    val df = (1L to 999L).toDF("x")
    val rows = Quality.benford(df, col("x")).orderBy("digit").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L),
      rows.map(_.getLong(0)).mkString(","))
    assert(rows.forall(_.getLong(1) == 111L), rows.mkString(","))
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-12, s"shares sum to $shareSum")
    // chi2 identical on every row and positive (uniform ≠ Benford)
    assert(rows.map(_.getDouble(4)).distinct.size == 1)
    assert(rows(0).getDouble(4) > 0)
    // a geometric series (multi-magnitude growth) fits Benford closely:
    // chi2 per-N statistic much smaller than the uniform case's
    val geo = (0 until 200).map(i => math.pow(1.07, i).toLong + 1)
      .toDF("x")
    val g = Quality.benford(geo, col("x")).collect()
    assert(g(0).getDouble(4) / 200 < rows(0).getDouble(4) / 999,
      s"geometric ${g(0).getDouble(4)} vs uniform ${rows(0).getDouble(4)}")
  }

  test("benford: absent digits scaffold to zero rows and inflate chi2") {
    // only leading digit 1 present — the truncated-feed signature
    val df = (10L to 19L).toDF("x")
    val rows = Quality.benford(df, col("x")).orderBy("digit").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L), "all 9 digit rows")
    assert(rows(0).getLong(1) == 10L && rows.drop(1).forall(_.getLong(1) == 0L))
    // chi2 = N·Σ(share−exp)²/exp over ALL digits: absent digit d adds
    // exp_d, so chi2/N ≥ Σ_{d≥2} exp_d = 1 − log10(2) ≈ 0.699 — an
    // understated (present-only) chi2 would be (1−exp₁)²/exp₁ alone
    val exp1 = rows(0).getDouble(3)
    val lower = 10.0 * ((1.0 - exp1) * (1.0 - exp1) / exp1 + (1.0 - exp1))
    // tolerance covers the 2⁻²⁶ ln quantization across the 9 terms
    assert(math.abs(rows(0).getDouble(4) - lower) < 1e-5,
      s"chi2 ${rows(0).getDouble(4)} vs expected ≈ $lower")
  }

  // --- Stats.spearman / kruskalWallis / mannKendall -------------------------

  test("spearman: monotone → ±1, tie-averaged ranks match the textbook value") {
    // sqrt(dx)·sqrt(dy) can be an ulp off dx even when the rank vectors
    // are identical, so compare with a tight tolerance, not equality
    val up = (1L to 20L).map(i => (i, i * i)).toDF("x", "y") // monotone, nonlinear
    assert(math.abs(Stats.spearman(up, col("x"), col("y")).collect()(0)
      .getDouble(1) - 1.0) < 1e-12)
    val down = (1L to 20L).map(i => (i, -i * i)).toDF("x", "y")
    assert(math.abs(Stats.spearman(down, col("x"), col("y")).collect()(0)
      .getDouble(1) + 1.0) < 1e-12)
    // hand case with ties: x = (1,2,2,3), y = (10,20,20,40) — rank
    // vectors identical under average ranks → rho exactly 1
    val tied = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L)).toDF("x", "y")
    assert(math.abs(Stats.spearman(tied, col("x"), col("y")).collect()(0)
      .getDouble(1) - 1.0) < 1e-12)
    // constant column → NULL
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    assert(Stats.spearman(const, col("x"), col("y")).collect()(0).isNullAt(1))
  }

  test("kruskalWallis: textbook three-group case; all-equal values → NULL") {
    // classic no-tie example: g1={1,2,3}, g2={4,5,6}, g3={7,8,9}
    // ranks are the values themselves; R = 6, 15, 24; N = 9
    // H = 12/(9·10)·(36+225+576)/3 − 3·10 = 12/90·279 − 30 = 7.2
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L), ("c", 7L), ("c", 8L), ("c", 9L)).toDF("g", "x")
    val r = Stats.kruskalWallis(df, "g", col("x")).collect()(0)
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 7.2) < 1e-12, r.toString)
    assert(math.abs(r.getDouble(3) - 7.2) < 1e-12, "no ties → C = 1")
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "x")
    val f = Stats.kruskalWallis(flat, "g", col("x")).collect()(0)
    assert(f.isNullAt(3), s"all-equal must NULL the corrected H: $f")
  }

  test("mannKendall: monotone S = n(n-1)/2, constant → NULL, known z") {
    val up = (1L to 10L).map(i => (1L, i, i, 10L + i)).toDF("k", "ts", "o", "x")
    val r = Stats.mannKendall(up, "k", "ts", col("x"), "o").collect()(0)
    assert(r.getLong(2) == 45L, s"S must be 45: $r")
    // Var·18 = 10·9·25 = 2250 → z = 44/sqrt(125)
    assert(math.abs(r.getDouble(3) - 44.0 / math.sqrt(125.0)) < 1e-12)
    val const = (1L to 5L).map(i => (1L, i, i, 7L)).toDF("k", "ts", "o", "x")
    assert(Stats.mannKendall(const, "k", "ts", col("x"), "o")
      .collect()(0).isNullAt(3))
    // partitioning invariance (exact integers end-to-end)
    val ev = Tables.events(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.mannKendall(df, "user_id", "ts",
        floor(col("value") * 64).cast("long"), "event_id")
        .collect().map(r => r.getLong(0) -> (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(run(ev) == run(ev.repartition(9, col("event_id"))))
  }

  test("mannKendall maxSeries: cap>=n is identity; capped key bounded, " +
      "deterministic, others untouched") {
    val ev = Tables.events(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame, cap: Int) =
      Stats.mannKendall(df, "user_id", "ts",
        floor(col("value") * 64).cast("long"), "event_id", maxSeries = cap)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val uncapped = run(ev, Int.MaxValue)
    // a cap above every series length replays uncapped results exactly
    assert(run(ev, 100000) == uncapped)
    val capped = run(ev, 5)
    // every key survives; n is min(n, cap); keys under the cap are
    // byte-identical to the uncapped run
    assert(capped.keySet == uncapped.keySet)
    capped.foreach { case (k, (n, s, z)) =>
      val (n0, s0, z0) = uncapped(k)
      assert(n == math.min(n0, 5L), s"key $k: n=$n vs uncapped $n0")
      if (n0 <= 5L) assert((s, z) == (s0, z0), s"key $k below cap changed")
    }
    // the md5 subsample is a function of the DATA, not the layout
    assert(run(ev.repartition(7, col("user_id")), 5) == capped)
    // a monotone series stays monotone under any order-preserving
    // subsample: S = C(cap, 2) exactly
    val up = (1L to 50L).map(i => (1L, i, i, 100L + i))
      .toDF("k", "ts", "o", "x")
    val r = Stats.mannKendall(up, "k", "ts", col("x"), "o", maxSeries = 8)
      .collect()(0)
    assert(r.getLong(1) == 8L && r.getLong(2) == 28L, r.toString)
  }

  // --- functions.JaroWinkler / FuzzyJoin.jaroWinklerPairs -------------------

  test("jaro_winkler: textbook values, boost threshold, nulls, codegen ≡ kernel") {
    import graft.functions.JaroWinkler
    // classic published examples
    assert(math.abs(JaroWinkler.similarity("MARTHA", "MARHTA")
      - 0.9611111111111111) < 1e-15)
    assert(math.abs(JaroWinkler.similarity("DWAYNE", "DUANE")
      - 0.8400000000000001) < 1e-15)
    assert(JaroWinkler.similarity("abc", "abc") == 1.0)
    assert(JaroWinkler.similarity("", "") == 1.0)
    assert(JaroWinkler.similarity("", "abc") == 0.0)
    assert(JaroWinkler.similarity("xyz", "abc") == 0.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply:
    // 'aXXXXXXX'/'aYYYYYYY' share prefix 'a' but jaro = 1.25/3 < 0.7,
    // so the result is the raw jaro, not the boosted 0.475
    assert(JaroWinkler.similarity("aXXXXXXX", "aYYYYYYY")
      == (1.0 / 8 + 1.0 / 8 + 1.0) / 3.0)
    // SQL surface (Registry path) runs the codegen'd expression; it must
    // agree with the static kernel on fixture strings, and NULL in → NULL out
    graft.functions.Registry.registerAll(spark)
    val rows = spark.sql(
      """SELECT jaro_winkler('martha', 'marhta') a,
        |       jaro_winkler('foo', CAST(NULL AS STRING)) b""".stripMargin)
      .collect()(0)
    assert(rows.getDouble(0) == JaroWinkler.similarity("martha", "marhta"))
    assert(rows.isNullAt(1))
  }

  test("jaroWinklerPairs: symmetric kernel, blocked pairs each meet once") {
    graft.functions.Registry.registerAll(spark)
    val df = Seq((1L, "k", "martha"), (2L, "k", "marhta"),
      (3L, "k", "zzzzzz"), (4L, "other", "martha")).toDF("id", "blk", "s")
    val got = graft.ops.FuzzyJoin.jaroWinklerPairs(df, "id", "s",
      Seq("blk"), minSim = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // only (1,2) qualifies: 3 is dissimilar, 4 is in another block
    assert(got == Set((1L, 2L)), got.toString)
  }

  // --- Stats.theilSen / cuped -----------------------------------------------

  test("theilSen: exact-line slope recovered; outlier does not move the median") {
    // x = 3·day + 7 sampled daily: every pairwise slope is exactly 3
    val day = 86400000000L
    val clean = (0L to 9L).map(i => (1L,
      new java.sql.Timestamp(i * day / 1000),
      3L * i + 7L)).toDF("k", "ts", "x")
    val r = Stats.theilSen(clean, "k", "ts", col("x")).collect()(0)
    assert(r.getLong(1) == 45L && r.getDouble(2) == 3.0, r.toString)
    // one wild outlier: OLS slope would swing, the pairwise median holds
    val dirty = clean.union(Seq((1L,
      new java.sql.Timestamp(10L * day / 1000), 1000000L))
      .toDF("k", "ts", "x"))
    val r2 = Stats.theilSen(dirty, "k", "ts", col("x")).collect()(0)
    assert(math.abs(r2.getDouble(2) - 3.0) < 1e-6,
      s"median slope must resist one outlier: $r2")
  }

  test("theilSen maxSeries: cap>=n is identity; capped pairs bounded and " +
      "an exact line's slope survives any subsample") {
    val day = 86400000000L
    val line = (0L to 39L).map(i => (1L,
      new java.sql.Timestamp(i * day / 1000), 3L * i + 7L))
      .toDF("k", "ts", "x")
    val full = Stats.theilSen(line, "k", "ts", col("x")).collect()(0)
    val same = Stats.theilSen(line, "k", "ts", col("x"), maxSeries = 1000)
      .collect()(0)
    assert((same.getLong(1), same.getDouble(2)) ==
      (full.getLong(1), full.getDouble(2)))
    val capped = Stats.theilSen(line, "k", "ts", col("x"), maxSeries = 6)
      .collect()(0)
    // C(6,2) = 15 pairs, every pairwise slope on an exact line is 3
    assert(capped.getLong(1) == 15L && capped.getDouble(2) == 3.0,
      capped.toString)
    // determinism across layouts
    val a = Stats.theilSen(Tables.events(spark, sf0001), "user_id", "ts",
      floor(col("value") * 64).cast("long"), maxSeries = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val b = Stats.theilSen(
      Tables.events(spark, sf0001).repartition(11, col("event_id")),
      "user_id", "ts", floor(col("value") * 64).cast("long"),
      maxSeries = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(a == b)
  }

  test("cuped: perfectly correlated covariate removes all variance; theta exact") {
    // y = 2x + 5 → theta = 2, rho2 = 1, var_y_cuped = 0
    val df = (1L to 50L).map(i => (i, 2L * i + 5L)).toDF("x", "y")
    val r = Stats.cuped(df, col("x"), col("y")).collect()(0)
    assert(r.getDouble(1) == 2.0, r.toString)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(4)) < 1e-9, s"residual variance: $r")
    // independent covariate: rho2 ≈ 0, var_y_cuped ≈ var_y
    val ind = (1L to 100L).map(i => (i % 7, i % 11)).toDF("x", "y")
    val r2 = Stats.cuped(ind, col("x"), col("y")).collect()(0)
    assert(r2.getDouble(2) < 0.05, s"near-independent rho2: $r2")
    // constant covariate → NULL theta
    val const = (1L to 10L).map(i => (4L, i)).toDF("x", "y")
    assert(Stats.cuped(const, col("x"), col("y")).collect()(0).isNullAt(1))
  }

  // --- Stats.cusum ----------------------------------------------------------

  test("cusum: planted level shift found at the boundary; partition-invariant") {
    // 20 points at level 10 then 20 at level 50 → t* = 20 exactly
    val xs = Seq.fill(20)(10L) ++ Seq.fill(20)(50L)
    val df = xs.zipWithIndex.map { case (x, i) =>
      (1L, new java.sql.Timestamp(1000L * i), i.toLong, x)
    }.toDF("k", "ts", "o", "x")
    val r = Stats.cusum(df, "k", "ts", col("x"), "o").collect()(0)
    assert(r.getLong(1) == 40L && r.getLong(2) == 20L, r.toString)
    // |S_20| = 20·(10 − 30) = 400 exactly
    assert(r.getDouble(4) == 400.0, r.toString)
    // flat series: every |S_t| = 0 → earliest t wins deterministically
    val flat = (0 until 10).map(i =>
      (2L, new java.sql.Timestamp(1000L * i), i.toLong, 5L))
      .toDF("k", "ts", "o", "x")
    assert(Stats.cusum(flat, "k", "ts", col("x"), "o")
      .collect()(0).getLong(2) == 1L)
    val ev = Tables.events(spark, sf0001)
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.cusum(d, "user_id", "ts", floor(col("value") * 64).cast("long"),
        "event_id").collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(run(ev) == run(ev.repartition(7, col("value"))))
  }

  // --- Stats.ksTest ---------------------------------------------------------

  test("ksTest: disjoint supports give D=1; identical samples give D=0") {
    val df = Seq(
      (1L, "a", 1L), (1L, "a", 2L), (1L, "a", 3L),
      (1L, "b", 4L), (1L, "b", 5L), (1L, "b", 6L),
      // key 2: identical arms → max |ns| = 0, earliest v wins
      (2L, "a", 7L), (2L, "b", 7L), (2L, "a", 9L), (2L, "b", 9L),
      // key 3: one empty arm → filtered out
      (3L, "a", 1L)
    ).toDF("k", "arm", "v")
    val r = Stats.ksTest(df, "k", col("arm") === "a", col("arm") === "b",
        col("v")).orderBy("k").collect()
    assert(r.length == 2)
    assert(r(0).getLong(0) == 1L && r(0).getDouble(4) == 1.0 &&
      r(0).getLong(5) == 3L, r(0).toString)
    assert(r(1).getLong(0) == 2L && r(1).getDouble(4) == 0.0 &&
      r(1).getLong(5) == 7L, r(1).toString)
    // tied points step both ECDFs together: interleaved equal values
    val tied = Seq((9L, "a", 5L), (9L, "b", 5L), (9L, "a", 5L),
      (9L, "b", 6L)).toDF("k", "arm", "v")
    val rt = Stats.ksTest(tied, "k", col("arm") === "a",
      col("arm") === "b", col("v")).collect()(0)
    // F1(5)=1, F2(5)=1/2 → D=1/2 at v=5
    assert(rt.getDouble(4) == 0.5 && rt.getLong(5) == 5L, rt.toString)
    // partition invariance on the corpus fixture
    val ev = Tables.events(spark, sf0001)
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.ksTest(d, "user_id", col("event_type") === "click",
        col("event_type") === "purchase",
        floor(col("value") * 64).cast("long")).collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(5))).toMap
    assert(run(ev) == run(ev.repartition(7, col("value"))))
  }

  // --- Stats.bhAdjust -------------------------------------------------------

  test("bhAdjust: textbook step-up adjustment, monotone, capped at 1") {
    val df = Seq(("t1", 0.005), ("t2", 0.009), ("t3", 0.05),
      ("t4", 0.5), ("t5", 0.9)).toDF("id", "p")
    val r = Stats.bhAdjust(df, "id", "p", alpha = 0.05)
      .orderBy("p_rank").collect()
    val adj = r.map(_.getDouble(4))
    // candidates: .025, .0225, .0833…, .625, .9 → running min from top
    assert(math.abs(adj(0) - 0.0225) < 1e-12 &&
      math.abs(adj(1) - 0.0225) < 1e-12, adj.toSeq.toString)
    assert(math.abs(adj(2) - 0.05 * 5 / 3) < 1e-12)
    assert(adj(3) == 0.625 && adj(4) == 0.9)
    // monotone non-decreasing in rank; rejections = the two small ps
    assert(adj.sliding(2).forall(w => w(0) <= w(1)))
    assert(r.map(_.getBoolean(5)).toSeq ==
      Seq(true, true, false, false, false))
    // p = 1 family: everything capped at exactly 1, nothing rejected
    val ones = Seq(("a", 1.0), ("b", 1.0)).toDF("id", "p")
    assert(Stats.bhAdjust(ones, "id", "p", 0.1).collect()
      .forall(x => x.getDouble(4) == 1.0 && !x.getBoolean(5)))
  }

  // --- Intervals ------------------------------------------------------------

  test("mergeIntervals/coverage: chains merge, touching merges, gaps split") {
    val df = Seq(
      (1L, 0L, 10L, 1L), (1L, 5L, 15L, 2L), (1L, 15L, 20L, 3L), // one island
      (1L, 30L, 40L, 4L), // gap → second island
      (1L, 2L, 3L, 5L),   // nested span, absorbed
      (2L, 0L, 1L, 6L)
    ).toDF("k", "s", "e", "o")
    val m = Intervals.mergeIntervals(df, "k", "s", "e", "o")
      .orderBy("k", "island").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq ==
      Seq((1L, 0L, 20L, 4L), (1L, 30L, 40L, 1L), (2L, 0L, 1L, 1L)))
    val c = Intervals.coverage(df, "k", "s", "e", "o")
      .orderBy("k").collect()
    assert(c(0).getLong(1) == 2L && c(0).getLong(3) == 30L) // 20 + 10
    assert(c(1).getLong(3) == 1L)
    // partition invariance on the corpus-shaped spans
    val us = unix_micros(col("ts"))
    val spans = Tables.events(spark, sf0001).select(col("user_id"),
      col("event_id"), us.as("s"),
      (us + (lit(1L) + floor(col("value") * 300).cast("long"))
        * lit(1000000L)).as("e"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Intervals.mergeIntervals(d, "user_id", "s", "e", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
    assert(run(spans) == run(spans.repartition(5, col("e"))))
  }

  // --- Stats.paretoFront ----------------------------------------------------

  test("paretoFront: matches brute-force dominance; ties all kept") {
    val rows = Seq((1L, 1L, 5L), (2L, 2L, 4L), (3L, 3L, 3L), (4L, 2L, 2L),
      (5L, 3L, 3L), (6L, 1L, 1L), (7L, 4L, 1L))
    val df = rows.toDF("id", "x", "y")
    val got = Stats.paretoFront(df, "x", "y").collect()
      .map(_.getLong(0)).sorted.toSeq
    // brute force: p survives iff no q strictly dominates it
    val want = rows.filter { case (_, px, py) =>
      !rows.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py) }
    }.map(_._1).sorted
    assert(got == want && got == Seq(1L, 2L, 3L, 5L, 7L), got.toString)
    // minimize via negation: frontier of (-x, -y) = min-min skyline
    val neg = df.select(col("id"), (-col("x")).as("x"), (-col("y")).as("y"))
    val gotMin = Stats.paretoFront(neg, "x", "y").collect()
      .map(_.getLong(0)).sorted.toSeq
    val wantMin = rows.filter { case (_, px, py) =>
      !rows.exists { case (_, qx, qy) =>
        qx <= px && qy <= py && (qx < px || qy < py) }
    }.map(_._1).sorted
    assert(gotMin == wantMin, gotMin.toString)
  }

  // --- Merge.applyChanges ---------------------------------------------------

  test("applyChanges: latest change wins; winning delete removes the key") {
    val ch = Seq(
      ("k1", 1L, "I", 10L), ("k1", 2L, "U", 20L),       // update wins
      ("k2", 1L, "I", 30L), ("k2", 2L, "D", 0L),        // delete wins
      ("k3", 2L, "D", 0L), ("k3", 3L, "I", 40L),        // re-insert after delete
      ("k4", 1L, "I", 50L)
    ).toDF("k", "seq", "op", "v")
    val out = Merge.applyChanges(ch, "k", Seq("seq"), "op")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq == Seq(("k1", 20L), ("k3", 40L), ("k4", 50L)))
    assert(!out.map(_._1).contains("k2"))
    // op column is consumed
    assert(!Merge.applyChanges(ch, "k", Seq("seq"), "op")
      .columns.contains("op"))
    // sequential replay ≡ one-shot apply: applying the first half then
    // the rest through upsert-with-delete semantics lands on the same
    // snapshot (order-independence of the latest-wins rule)
    val all = Merge.applyChanges(ch, "k", Seq("seq"), "op")
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val shuffled = Merge.applyChanges(ch.repartition(5, col("v")), "k",
      Seq("seq"), "op").collect()
      .map(r => (r.getString(0), r.getLong(2))).toSet
    assert(all == shuffled)
  }

  test("applyChanges: malformed NULL-op winner surfaces, never silently drops") {
    val ch = Seq(
      ("k1", 1L, Some("I"), 10L), ("k1", 2L, None: Option[String], 99L),
      ("k2", 1L, Some("I"), 30L)
    ).toDF("k", "seq", "op", "v")
    val out = Merge.applyChanges(ch, "k", Seq("seq"), "op")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(2)))
    // the NULL-op row won k1's sequence race: it must appear (v=99),
    // not vanish as a pseudo-delete
    assert(out.toSeq == Seq(("k1", 99L), ("k2", 30L)), out.mkString(","))
  }

  // --- Quality.kAnonymity ---------------------------------------------------

  test("kAnonymity: class sizes, l-diversity, risk flag") {
    val df = Seq(
      ("US", "A", 1), ("US", "A", 2), ("US", "A", 2),
      ("US", "B", 3),
      ("DE", "A", 4), ("DE", "A", 4)
    ).toDF("country", "seg", "s")
    val r = graft.ops.Quality.kAnonymity(df, Seq("country", "seg"),
        col("s"), k = 3)
      .orderBy("country", "seg").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      ("DE", "A", 2L, 1L, true),
      ("US", "A", 3L, 2L, false),
      ("US", "B", 1L, 1L, true)))
  }

  // --- Sampling.poissonBootstrap --------------------------------------------

  test("poissonBootstrap: constant metric collapses CI; CI brackets mean") {
    // constant x → every replicate's weighted mean is exactly x
    val const = (1 to 100).map(i => ("g", i.toLong, 7L))
      .toDF("g", "id", "x")
    val rc = Sampling.poissonBootstrap(const, "g", "id", col("x"),
      b = 16, alpha = 0.125, seed = "t").collect()(0)
    assert(rc.getLong(1) == 100L && rc.getDouble(2) == 7.0)
    assert(rc.getDouble(3) == 7.0 && rc.getDouble(4) == 7.0)
    // real data: lo <= estimate <= hi, strict for a dispersed metric
    val ev = Tables.events(spark, sf0001)
    val r = Sampling.poissonBootstrap(ev, "event_type", "event_id",
        floor(col("value") * 1000).cast("long"), b = 40, alpha = 0.05,
        seed = "q216")
      .orderBy("event_type").collect()
    assert(r.length == 5)
    r.foreach { x =>
      assert(x.getDouble(3) < x.getDouble(2) && x.getDouble(2) < x.getDouble(4),
        x.toString)
    }
    // deterministic and partition-invariant
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.poissonBootstrap(d, "event_type", "event_id",
        floor(col("value") * 1000).cast("long"), 40, 0.05, "q216")
        .collect().map(x => x.getString(0) ->
          (x.getDouble(3), x.getDouble(4))).toMap
    assert(run(ev) == run(ev.repartition(9, col("value"))))
  }

  // --- Rollup.joinDelta -------------------------------------------------------

  test("joinDelta: view + delta equals the full join of the grown sides") {
    val orders = Tables.table(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("k"),
        col("o_totalprice"))
    val cust = Tables.table(spark, sf0001, "customer")
      .select(col("c_custkey").as("k"), col("c_name"))
    val a  = orders.filter(col("o_orderkey") % 2 === 0)
    val da = orders.filter(col("o_orderkey") % 2 =!= 0)
    val b  = cust.filter(col("k") % 3 === 0)
    val db = cust.filter(col("k") % 3 =!= 0)
    val incremental = a.join(b, "k")
      .unionByName(Rollup.joinDelta(a, da, b, db, "k"))
      .collect().map(_.toString).sorted.toSeq
    val full = orders.join(cust, "k")
      .collect().map(_.toString).sorted.toSeq
    assert(incremental == full && full.nonEmpty)
    // empty deltas contribute nothing
    val empty = Rollup.joinDelta(a, da.limit(0), b, db.limit(0), "k")
    assert(empty.count() == 0)
  }

  // --- Stats.conformalIntervalByGroup -----------------------------------------

  test("conformalIntervalByGroup: per-group widths; per-group coverage") {
    // group a: residuals 1..9 → q = 9; group b: residuals all 2 → q = 2
    val cal = ((1 to 9).map(i => ("a", i.toDouble, 0.0)) ++
      (1 to 9).map(_ => ("b", 2.0, 0.0))).toDF("g", "y", "yhat")
    val test = Seq(("a", 0.0, 10.0), ("b", 0.0, 10.0)).toDF("g", "y", "yhat")
    val r = Stats.conformalIntervalByGroup(cal, test, "g", "y", "yhat", 0.1)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(3), x.getDouble(4))).toMap
    assert(r("a") == ((1.0, 19.0)) && r("b") == ((8.0, 12.0)), r.toString)
    // groups absent from calibration drop (inner join)
    val t2 = Seq(("zz", 0.0, 1.0)).toDF("g", "y", "yhat")
    assert(Stats.conformalIntervalByGroup(cal, t2, "g", "y", "yhat", 0.1)
      .count() == 0)
  }

  // --- Skew.keyProfile / Stats.liftTable -------------------------------------

  test("keyProfile: planted hot key dominates; shares sum sanity") {
    val rows = (1 to 90).map(i => ("hot", i.toLong)) ++
      (1 to 10).map(i => (s"k$i", 1000L + i))
    val df = rows.toDF("k", "v")
    val r = graft.ops.Skew.keyProfile(df, Seq("k")).collect()(0)
    assert(r.getAs[Long]("n_keys") == 11L && r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[String]("top_key") == "hot" &&
      r.getAs[Long]("top_count") == 90L)
    assert(r.getAs[Double]("max_share") == 0.9)
    assert(r.getAs[Double]("p50") == 1.0) // median key holds one row
  }

  test("liftTable: perfect ranking concentrates positives in decile 1") {
    // scores equal the label → all positives rank first
    val df = (1 to 100).map(i =>
      (i.toLong, if (i <= 10) 1.0 else 0.0, i <= 10)).toDF("id", "s", "y")
    val r = Stats.liftTable(df, "id", col("s"), col("y"), buckets = 10)
      .orderBy("decile").collect()
    assert(r(0).getLong(2) == 10L && r(0).getDouble(4) == 10.0,
      r(0).toString) // lift 10x in the top decile
    assert(r(0).getDouble(5) == 1.0) // all gain captured immediately
    assert(r.drop(1).forall(_.getLong(2) == 0L))
    // counts partition the input
    assert(r.map(_.getLong(1)).sum == 100L)
  }

  test("Ranks: two-shuffle rank ≡ global row_number; ntileOfRank ≡ NTILE; " +
      "both partitioning-invariant") {
    import org.apache.spark.sql.expressions.Window
    // awkward sizes on purpose: ties in the sort key (id tiebreak), n not
    // divisible by buckets, n < buckets
    val df = (1 to 103).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "s")
    for (parts <- Seq(1, 5, 16); buckets <- Seq(4, 10, 200)) {
      val in = df.repartition(parts)
      val ref = in.withColumn("r",
          row_number().over(Window.orderBy(col("s").desc, col("id"))))
        .withColumn("t", ntile(buckets).over(
          Window.orderBy(col("s").desc, col("id"))))
        .select("id", "r", "t").collect().map(r =>
          r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      val got = graft.ops.Ranks
        .globalRowNumber(in, Seq(col("s").desc, col("id")))
        .withColumn("t", graft.ops.Ranks.ntileOfRank(col("r"), lit(103L),
          buckets).cast("int"))
        .select("id", "r", "t").collect().map(r =>
          r.getLong(0) -> (r.getLong(1).toInt, r.getInt(2))).toMap
      assert(got == ref, s"parts=$parts buckets=$buckets")
    }
  }

  test("runsTest: partition-boundary stitch ≡ single-sequence count") {
    // the de-windowed runs count must not depend on the input layout —
    // force many range partitions over a short clumpy sequence
    val flags = Seq(1, 1, 0, 1, 0, 0, 0, 1, 1, 0, 1, 1, 1, 0, 0)
    val df = flags.zipWithIndex
      .map { case (f, i) => (i.toLong, i.toLong, f == 1) }
      .toDF("ts", "id", "f")
    val expectRuns = 1 + flags.sliding(2).count(p => p(0) != p(1))
    for (parts <- Seq(1, 4, 16)) {
      val r = Stats.runsTest(df.repartition(parts), "ts", "id", col("f"))
        .collect()(0)
      assert(r.getAs[Long]("runs") == expectRuns, s"parts=$parts: $r")
      assert(r.getAs[Long]("n1") == flags.count(_ == 1))
    }
  }

  // --- Stats.conformalInterval ----------------------------------------------

  test("conformalInterval: exact order-statistic q; empirical coverage") {
    // 9 calibration residuals 1..9 with yhat = 0: k = ceil(0.9·10) = 9
    // → q = 9; test rows get [ŷ−9, ŷ+9]
    val cal = (1 to 9).map(i => (i.toDouble, 0.0)).toDF("y", "yhat")
    val test = Seq((100.0, 5.0)).toDF("y", "yhat")
    val r = Stats.conformalInterval(cal, test, "y", "yhat", alpha = 0.1)
      .collect()(0)
    assert(r.getDouble(2) == -4.0 && r.getDouble(3) == 14.0, r.toString)
    // rank beyond n clips to the max residual
    val tiny = Seq((3.0, 0.0), (7.0, 0.0)).toDF("y", "yhat")
    val rt = Stats.conformalInterval(tiny, test, "y", "yhat", 0.01)
      .collect()(0)
    assert(rt.getDouble(3) - rt.getDouble(2) == 14.0, rt.toString)
    // empirical coverage >= 1 - alpha on a real split
    val base = Tables.table(spark, sf0001, "orders").select(
      col("o_orderkey"), col("o_orderpriority"),
      floor(col("o_totalprice")).cast("long").as("y"),
      when(Sampling.hashBucket(col("o_orderkey")) < 8000, "cal")
        .otherwise("test").as("split"))
    val m = base.filter(col("split") === "cal").groupBy("o_orderpriority")
      .agg((sum("y").cast("double") / count(lit(1))).as("yhat"))
    val calD = base.filter(col("split") === "cal").join(m, "o_orderpriority")
    val testD = base.filter(col("split") === "test").join(m, "o_orderpriority")
    val iv = Stats.conformalInterval(calD, testD, "y", "yhat", 0.1)
    val cov = iv.agg(avg(when(col("y") >= col("lo") &&
      col("y") <= col("hi"), 1.0).otherwise(0.0))).head().getDouble(0)
    assert(cov >= 0.85, s"coverage $cov") // guaranteed >= 0.9 in expectation
  }

  // --- Multimodal.mediaFromFiles --------------------------------------------

  test("mediaFromFiles: raw files ingest with recovered metadata, stable ids") {
    import graft.ops.{MediaCodec, Multimodal}
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    put("a.png", MediaCodec.syntheticPng(40, 24, 7L, 3))
    put("b.png", MediaCodec.syntheticPng(64, 64, 9L, 1))
    put("c.wav", MediaCodec.syntheticWav(8000, 1500L, 440.0, 12000))
    put("d.bin", Array[Byte](1, 2, 3, 4))
    val rows = Multimodal.mediaFromFiles(spark, dir.toString)
      .collect().map(m => (m.kind, m.meta.format, m.meta.width,
        m.meta.height, m.meta.durationMs, m.media_id)).sortBy(_.toString)
    assert(rows.count(_._1 == "image") == 2 &&
      rows.count(_._1 == "audio") == 1 && rows.count(_._1 == "binary") == 1)
    val imgs = rows.filter(_._1 == "image").map(r => (r._3, r._4)).sorted
    assert(imgs.toSeq == Seq((40, 24), (64, 64)), imgs.toSeq.toString)
    val wav = rows.find(_._1 == "audio").get
    assert(math.abs(wav._5 - 1500L) <= 1, wav.toString)
    // ids are pure functions of the file NAME: re-ingest after adding a
    // file preserves every existing id (standing-index discipline)
    val before = Multimodal.mediaFromFiles(spark, dir.toString)
      .collect().map(m => m.media_id).toSet
    put("e.png", MediaCodec.syntheticPng(16, 16, 3L, 2))
    val after = Multimodal.mediaFromFiles(spark, dir.toString)
      .collect().map(m => m.media_id).toSet
    assert(before.subsetOf(after) && after.size == before.size + 1)
  }

  // --- Stats.woeIv / looTargetEncode ----------------------------------------

  test("woeIv: hand-computed WOE/IV; monotone with separation") {
    // bucket A: 3 pos, 1 neg; bucket B: 1 pos, 3 neg; P = N = 4
    val df = Seq(("A", true), ("A", true), ("A", true), ("A", false),
      ("B", true), ("B", false), ("B", false), ("B", false))
      .toDF("b", "y")
    val r = Stats.woeIv(df, "b", col("y")).orderBy("b").collect()
    val woeA = math.floor(math.log((3.5 * 4) / (1.5 * 4)) * 67108864.0) /
      67108864.0
    assert(math.abs(r(0).getDouble(3) - woeA) < 1e-12, r(0).toString)
    // symmetric buckets → woe_B = -woe_A on the unquantized value;
    // after the grid they differ by at most one step
    assert(math.abs(r(1).getDouble(3) + r(0).getDouble(3)) < 1e-7)
    // iv_total identical on every row and positive (buckets separate)
    assert(r.map(_.getDouble(5)).distinct.length == 1 &&
      r(0).getDouble(5) > 0)
    val ivExpect = (3.0 / 4 - 1.0 / 4) * r(0).getDouble(3) +
      (1.0 / 4 - 3.0 / 4) * r(1).getDouble(3)
    assert(math.abs(r(0).getDouble(5) - ivExpect) < 1e-12)
  }

  test("mutualInformation: independent vars give ~0; identical give H") {
    // perfectly dependent: y == x → MI = H(X) = ln 2 for a fair split
    val dep = (1 to 100).map(i => (i % 2, i % 2)).toDF("x", "y")
    val rd = Stats.mutualInformation(dep, "x", "y").collect()
    assert(math.abs(rd(0).getDouble(6) - math.log(2)) < 1e-6)
    // independent: y = i % 2, x = i % 4 / 2 pattern → every cell
    // c·n = cx·cy exactly → every term lnq(1) = 0 → MI = 0
    val ind = (0 until 100).map(i => (i % 2, (i / 2) % 2)).toDF("x", "y")
    val ri = Stats.mutualInformation(ind, "x", "y").collect()
    assert(ri.forall(_.getDouble(6) == 0.0), ri.map(_.toString).toSeq)
    // partition invariance on the fixture
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), floor(col("value") * 4).cast("long").as("y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.mutualInformation(d, "event_type", "y").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(run(ev) == run(ev.repartition(7, col("y"))))
  }

  test("looTargetEncode: excludes self; singleton is NULL") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 7L)).toDF("id", "c", "y")
    val m = Stats.looTargetEncode(df, "c", col("y"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("loo"))).toMap
    assert(m(1L).contains(25.0) && m(2L).contains(20.0) &&
      m(3L).contains(15.0))
    assert(m(4L).isEmpty)
  }

  // --- Sampling.weightedSampleWithoutReplacement ----------------------------

  test("weightedSampleWOR: no replacement, weight-monotone, deterministic") {
    val docs = Tables.table(spark, sf0001, "documents")
      .filter(col("n_chars") > 0)
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSampleWithoutReplacement(d, "source", "doc_id",
        col("n_chars"), k = 20, seed = "t")
        .collect().map(r => (r.getAs[String]("source"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("sample_rank"))).toSet
    val s1 = run(docs)
    // without replacement: ids unique within each group
    val ids = s1.toSeq.map(t => (t._1, t._2))
    assert(ids.distinct.size == ids.size)
    // deterministic + partition invariant
    assert(s1 == run(docs.repartition(7, col("doc_id"))))
    // weight-proportional: sampling from a 2-point weight distribution —
    // heavy rows (w=1000) must dominate light rows (w=1) in the sample
    val skewed = (1 to 200).map(i =>
      ("g", i.toLong, if (i <= 100) 1000L else 1L)).toDF("g", "id", "w")
    val picked = Sampling.weightedSampleWithoutReplacement(skewed, "g",
      "id", col("w"), k = 50, seed = "t").collect()
      .map(_.getAs[Long]("id"))
    assert(picked.count(_ <= 100) >= 45, s"heavy picked ${picked.count(_ <= 100)}")
    // non-positive weights must never outrank valid rows (a negative w
    // flips ln(u)/w positive — unguarded it would ALWAYS be selected)
    val bad = Seq(("g", 1L, 5L), ("g", 2L, -3L), ("g", 3L, 0L),
      ("g", 4L, 2L)).toDF("g", "id", "w")
    val sel = Sampling.weightedSampleWithoutReplacement(bad, "g", "id",
      col("w"), k = 2, seed = "t").collect().map(_.getAs[Long]("id")).toSet
    assert(sel == Set(1L, 4L), s"selected $sel")
  }

  // --- Indexing.rrfFuse -----------------------------------------------------

  test("rrfFuse: hand-computed fusion; doc in both systems outranks") {
    // q1: docA ranked 1 by sys1 and 2 by sys2; docB ranked 1 by sys2
    // only; docC ranked 2 by sys1 only.
    val r = Seq(("q1", "A", "s1", 1), ("q1", "C", "s1", 2),
      ("q1", "B", "s2", 1), ("q1", "A", "s2", 2)).toDF("q", "d", "s", "r")
    val out = Indexing.rrfFuse(r, "q", "d", "s", "r", kConst = 60,
      topK = 10).orderBy("fused_rank").collect()
    val scores = out.map(x => x.getString(1) -> x.getDouble(3)).toMap
    assert(math.abs(scores("A") - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(scores("B") - 1.0 / 61) < 1e-15)
    assert(math.abs(scores("C") - 1.0 / 62) < 1e-15)
    // both-systems doc wins; rank ties impossible (doc tiebreak)
    assert(out.map(_.getString(1)).toSeq == Seq("A", "B", "C"))
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 1L))
    // topK truncates per query
    val many = (1 to 30).map(i => ("q2", s"d$i", "s1", i))
      .toDF("q", "d", "s", "r")
    assert(Indexing.rrfFuse(many, "q", "d", "s", "r", 60, 5).count() == 5)
  }

  // --- Components.hitsExact -------------------------------------------------

  test("hitsExact: hand-computed two-round scores; partition-invariant") {
    // 1→3, 2→3, 3→4: 1,2 are pure hubs, 3 the authority (and a weak hub)
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = Components.hitsExact(e, "u", "v", iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((1000000L, 0L)), 2L -> ((1000000L, 0L)),
      3L -> ((250000L, 1000000L)), 4L -> ((0L, 250000L))), got.toString)
    // partition invariance on a fixture-derived bipartite graph
    val li = Tables.table(spark, sf0001, "lineitem")
      .filter(col("l_orderkey") < 500)
      .select((col("l_orderkey") * 2).as("u"),
        (col("l_partkey") * 2 + 1).as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Components.hitsExact(d, "u", "v", 2).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run(li) == run(li.repartition(7, col("v"))))
  }

  // --- Resample.holtWinters -------------------------------------------------

  test("holtWinters: linear series is tracked exactly; <2 points dropped") {
    // perfectly linear series: level = last x, trend = slope, exactly
    val lin = Seq((1L, 1L, 10.0), (1L, 2L, 12.0), (1L, 3L, 14.0),
      (2L, 1L, 5.0)).map { case (k, i, x) =>
      (k, new java.sql.Timestamp(1000L * i), i, x) }
      .toDF("k", "ts", "o", "x")
    val r = Resample.holtWinters(lin, "k", "ts", "o", "x",
      alpha = 0.5, beta = 0.5, horizon = 3).collect()
    assert(r.length == 1) // key 2 has a single point → dropped
    assert(r(0).getDouble(2) == 14.0 && r(0).getDouble(3) == 2.0 &&
      r(0).getDouble(4) == 20.0, r(0).toString)
    // partition invariance on the fixture
    val ev = Tables.events(spark, sf0001)
    def run(d: org.apache.spark.sql.DataFrame) =
      Resample.holtWinters(d, "user_id", "ts", "event_id", "value")
        .collect().map(x => x.getLong(0) ->
          (x.getDouble(2), x.getDouble(3))).toMap
    assert(run(ev) == run(ev.repartition(7, col("value"))))
  }

  // --- Resample.seasonalProfile -------------------------------------------

  test("seasonalProfile: epoch-day dow convention and exact moments") {
    // 1970-01-01 was a Thursday → dow 4; 1970-01-04 a Sunday → dow 0
    val ev = Seq(
      ("a", java.sql.Timestamp.valueOf("1970-01-01 10:00:00"), 2.0),
      ("a", java.sql.Timestamp.valueOf("1970-01-01 11:00:00"), 4.0),
      ("a", java.sql.Timestamp.valueOf("1970-01-04 09:00:00"), 8.0))
      .toDF("g", "ts", "v")
    val got = Resample.seasonalProfile(ev, "g", "ts", "v", scaleBits = 6)
      .orderBy("dow").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 4L), got.mkString(","))
    val thu = got(1)
    assert(thu.getLong(2) == 2L && math.abs(thu.getDouble(3) - 3.0) < 1e-12)
    // sample variance of {2,4} = 2.0 (exact in the scaled-integer form)
    assert(math.abs(thu.getDouble(4) - 2.0) < 1e-12, thu.toString)
    val sun = got(0)
    assert(sun.getLong(2) == 1L && sun.isNullAt(4), sun.toString)
  }

  // --- Survival.nelsonAalen -------------------------------------------------

  test("nelsonAalen: hand-computed hazard; additive companion to KM") {
    // durations: deaths at t=1 (2 of 4 at risk), t=2 (1 of 2); censored at 3
    val subj = Seq((1L, true), (1L, true), (2L, true), (3L, false))
      .toDF("dur", "obs")
    val rows = Survival.nelsonAalen(subj, "dur", "obs", Seq.empty)
      .orderBy("t").collect()
    assert(rows.map(_.getAs[Long]("t")).toSeq == Seq(1L, 2L))
    assert(math.abs(rows(0).getAs[Double]("cum_hazard") - 0.5) < 1e-15)
    assert(math.abs(rows(1).getAs[Double]("cum_hazard") - 1.0) < 1e-15)
    assert(math.abs(rows(0).getAs[Double]("hazard_var") - 2.0 / 16) < 1e-15)
    assert(math.abs(rows(1).getAs[Double]("hazard_var") -
      (2.0 / 16 + 1.0 / 4)) < 1e-15)
    // monotone non-decreasing on real data, and n_risk bookkeeping
    // matches KM's (the two share the collapse)
    val lt = Survival.userLifetimes(Tables.events(spark, sf0001),
      "user_id", "ts", quietUs = 43200000000L)
    val na = Survival.nelsonAalen(lt, "duration_days", "observed", Seq.empty)
      .orderBy("t").collect()
    assert(na.sliding(2).forall(p => p.length < 2 ||
      p(0).getAs[Double]("cum_hazard") <= p(1).getAs[Double]("cum_hazard")))
    val km = Survival.kaplanMeier(lt, "duration_days", "observed", Seq.empty)
      .orderBy("t").collect()
    assert(na.map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"))).toSeq ==
      km.map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"))).toSeq)
  }

  // --- Stats.diffInDiff -----------------------------------------------------

  test("diffInDiff: hand-computed 2x2; parallel trends give did = 0") {
    val d = Seq(
      (true, true, 30L), (true, true, 34L),   // treat/post mean 32
      (true, false, 10L),                     // treat/pre  mean 10
      (false, true, 25L), (false, true, 27L), // ctrl/post  mean 26
      (false, false, 20L)                     // ctrl/pre   mean 20
    ).toDF("tr", "po", "y")
    val r = Stats.diffInDiff(d, col("tr"), col("po"), col("y")).collect()(0)
    assert(r.getAs[Double]("did") == (32.0 - 10.0) - (26.0 - 20.0))
    assert(r.getAs[Long]("n_treat_post") == 2L &&
      r.getAs[Double]("m_ctrl_pre") == 20.0)
    // shifting both arms by the same post effect cancels
    val par = Seq((true, false, 10L), (true, true, 15L),
      (false, false, 20L), (false, true, 25L)).toDF("tr", "po", "y")
    assert(Stats.diffInDiff(par, col("tr"), col("po"), col("y"))
      .collect()(0).getAs[Double]("did") == 0.0)
  }

  // --- Stats.brownForsythe --------------------------------------------------

  test("brownForsythe: identical spreads give F ~ 0; inflated group detected") {
    // same |x - med| profile in both groups → between-group term 0
    val same = Seq(("a", 1L), ("a", 5L), ("a", 9L),
      ("b", 11L), ("b", 15L), ("b", 19L)).toDF("g", "x")
    val f0 = Stats.brownForsythe(same, "g", col("x")).collect()(0)
    assert(f0.getAs[Long]("k") == 2L && f0.getAs[Long]("n") == 6L)
    assert(math.abs(f0.getAs[Double]("f_stat")) < 1e-12, f0.toString)
    // one group 10x spread → large F
    val diff = Seq(("a", 1L), ("a", 5L), ("a", 9L),
      ("b", -25L), ("b", 15L), ("b", 55L)).toDF("g", "x")
    val f1 = Stats.brownForsythe(diff, "g", col("x")).collect()(0)
    // hand value: between 3456, within 4309.33 on 1/4 df → F ≈ 3.208
    assert(math.abs(f1.getAs[Double]("f_stat") -
      3456.0 / (4309.0 + 1.0 / 3) * 4) < 1e-9, f1.toString)
    // even-n median: doubled median of (1,3) is 4 → z doubled = |2x-4|
    val even = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L))
      .toDF("g", "x")
    val fe = Stats.brownForsythe(even, "g", col("x")).collect()(0)
    assert(math.abs(fe.getAs[Double]("f_stat")) < 1e-12, fe.toString)
  }

  // --- Stats.mcnemar --------------------------------------------------------

  test("mcnemar: discordant-only statistic; no discordance is NULL") {
    val d = Seq((true, false), (true, false), (true, false),
      (false, true), (true, true), (false, false)).toDF("a", "b")
    val r = Stats.mcnemar(d, col("a"), col("b")).collect()(0)
    assert(r.getAs[Long]("b") == 3L && r.getAs[Long]("c") == 1L)
    assert(r.getAs[Long]("n_both") == 1L && r.getAs[Long]("n_neither") == 1L)
    assert(r.getAs[Double]("chi2") == 4.0 / 4.0)
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Stats.mcnemar(agree, col("a"), col("b")).collect()(0)
      .isNullAt(4))
  }

  // --- Stats.cohenKappa -----------------------------------------------------

  test("cohenKappa: perfect agreement 1; known 2x2 value; label-swap invariance") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(Stats.cohenKappa(perfect, col("a"), col("b")).collect()(0)
      .getAs[Double]("kappa") == 1.0)
    // textbook 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Stats.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    val po = 35.0 / 50
    val pe = (25.0 * 30 + 25.0 * 20) / (50.0 * 50)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-12)
    // one-label degenerate: p_e = 1 → NULL
    val degen = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Stats.cohenKappa(degen, col("a"), col("b")).collect()(0)
      .isNullAt(4))
  }

  // --- Stats.cmh ------------------------------------------------------------

  test("cmh: single stratum matches hand E/V; degenerate strata drop to 0") {
    // 2x2: a=8, b=2, c=4, d=6 → n=20, r1=10, c1=12, E=6, V=r1r2c1c2/(n²(n-1))
    val d = (Seq.fill(8)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(4)((false, true)) ++ Seq.fill(6)((false, false)))
      .map { case (e, o) => ("s1", e, o) }.toDF("s", "e", "o")
    val r = Stats.cmh(d, col("s"), col("e"), col("o")).collect()(0)
    val v = 10.0 * 10 * 12 * 8 / (20.0 * 20 * 19)
    assert(math.abs(r.getAs[Double]("sum_dev") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("sum_var") - v) < 1e-12)
    assert(math.abs(r.getAs[Double]("cmh") - 4.0 / v) < 1e-12)
    // adding an all-exposed stratum (degenerate margin) changes nothing
    val d2 = d.unionByName(Seq(("s2", true, true), ("s2", true, false))
      .toDF("s", "e", "o"))
    val r2 = Stats.cmh(d2, col("s"), col("e"), col("o")).collect()(0)
    assert(r2.getAs[Long]("n_strata") == 2L)
    assert(math.abs(r2.getAs[Double]("cmh") - r.getAs[Double]("cmh")) < 1e-12)
  }

  // --- Association.itemItemCosine -------------------------------------------

  test("itemItemCosine: hand cosine, symmetry, k cap, minCo filter") {
    // users 1..3: {A,B}, {A,B}, {A,C} → co(A,B)=2, co(A,C)=1
    val ui = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"),
      (3L, "C"), (3L, "C")).toDF("u", "item") // dup interaction collapses
    val out = Association.itemItemCosine(ui, "u", "item", k = 10,
      minCo = 1L).collect()
    val m = out.map(r => (r.getAs[String]("item"),
      r.getAs[String]("neighbor")) -> r.getAs[Double]("cosine")).toMap
    assert(math.abs(m(("A", "B")) - 2.0 / (math.sqrt(3) * math.sqrt(2)))
      < 1e-15)
    assert(m(("A", "B")) == m(("B", "A")), "symmetric emission")
    assert(math.abs(m(("A", "C")) - 1.0 / (math.sqrt(3) * math.sqrt(1)))
      < 1e-15)
    assert(!m.contains(("B", "C")), "never co-occur")
    // minCo=2 drops the singleton pair; k=1 keeps only the best neighbor
    val capped = Association.itemItemCosine(ui, "u", "item", k = 1,
      minCo = 2L).collect()
    assert(capped.map(r => (r.getAs[String]("item"),
      r.getAs[String]("neighbor"))).toSet == Set(("A", "B"), ("B", "A")))
  }

  test("itemItemCosine: maxBasket caps the power-law user's pair volume") {
    // One bot with 200 distinct items over a 3-user organic base: uncapped,
    // the bot alone contributes C(200,2) = 19,900 unordered pairs to the
    // co-count shuffle; capped at 8 it contributes C(8,2) = 28. The cap must
    // (a) bound the pair volume, (b) keep the capped basket a deterministic
    // subset (same selection on every run), and (c) leave bot-free organic
    // co-counts untouched.
    val organic = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C")).toDF("u", "item")
    val bot = spark.range(200)
      .select(lit(99L).as("u"), concat(lit("bot"), col("id")).as("item"))
    val ui = organic.unionByName(bot)
    def pairVolume(maxBasket: Int): Long =
      Association.itemItemCosine(ui, "u", "item", k = 1000000,
        minCo = 1L, maxBasket = maxBasket)
        .count() / 2 // both directions emitted
    assert(pairVolume(Int.MaxValue) >= 19900L, "uncapped bot fan-out")
    val capped = pairVolume(8)
    // bot pairs ≤ C(8,2)=28; organic pairs (A,B),(A,C) plus at most 8×2
    // bot-item overlaps with organic items (bot items are disjoint here)
    assert(capped <= 28 + 2, s"capped pair volume must be bounded: $capped")
    val run1 = Association.itemItemCosine(ui, "u", "item", k = 5,
      minCo = 1L, maxBasket = 8).collect().toSet
    val run2 = Association.itemItemCosine(ui.repartition(13), "u", "item",
      k = 5, minCo = 1L, maxBasket = 8).collect().toSet
    assert(run1 == run2, "capped selection must be partitioning-invariant")
    val m = Association.itemItemCosine(ui, "u", "item", k = 10, minCo = 1L,
      maxBasket = 8).collect()
      .map(r => (r.getAs[String]("item"), r.getAs[String]("neighbor")) ->
        r.getAs[Long]("co")).toMap
    assert(m(("A", "B")) == 2L && m(("A", "C")) == 1L,
      "organic co-counts survive the bot cap untouched")
  }

  // --- Indexing.retrievalEval -----------------------------------------------

  test("retrievalEval: hand MRR/recall/nDCG; perfect ranking gives exactly 1") {
    val results = Seq(("q1", "d3", 1L), ("q1", "d1", 2L), ("q1", "d2", 3L),
      ("q2", "d9", 1L)).toDF("q", "d", "rank")
    val qrels = Seq(("q1", "d1", 2L), ("q1", "d2", 1L), ("q2", "d8", 1L))
      .toDF("q", "d", "rel")
    val out = Indexing.retrievalEval(results, qrels, "q", "d", "rank",
        "rel", k = 3)
      .orderBy("q").collect()
    val r1 = out(0)
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    assert(r1.getAs[Long]("n_rel_total") == 2L &&
      r1.getAs[Long]("n_rel_at_k") == 2L)
    assert(r1.getAs[Double]("rr") == 0.5)
    assert(r1.getAs[Double]("recall_at_k") == 1.0)
    val dcg = 2.0 / lg2(3) + 1.0 / lg2(4)
    val idcg = 2.0 / lg2(2) + 1.0 / lg2(3)
    assert(math.abs(r1.getAs[Double]("dcg") - dcg) < 1e-6)
    assert(math.abs(r1.getAs[Double]("ndcg_at_k") - dcg / idcg) < 1e-6)
    // q2 retrieved nothing relevant: rr 0, recall 0, ndcg 0/idcg = 0
    val r2 = out(1)
    assert(r2.getAs[Double]("rr") == 0.0 &&
      r2.getAs[Double]("recall_at_k") == 0.0 &&
      r2.getAs[Double]("ndcg_at_k") == 0.0)
    // the ideal ordering retrieved verbatim folds the SAME terms →
    // ndcg is exactly 1.0, not 1±ulp
    val perfect = Seq(("q1", "d1", 1L), ("q1", "d2", 2L))
      .toDF("q", "d", "rank")
    assert(Indexing.retrievalEval(perfect, qrels.filter(col("q") === "q1"),
        "q", "d", "rank", "rel", k = 3)
      .collect()(0).getAs[Double]("ndcg_at_k") == 1.0)
  }

  // --- Dedup.ngramContainmentPairs ------------------------------------------

  test("ngramContainment: finds asymmetric subset pairs Jaccard misses") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d e f"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.6)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Double]("containment")).toMap
    // doc1's 2 shingles both inside doc2's 4 → containment(1→2) = 1.0,
    // but (2→1) = 0.5 and Jaccard = 0.5: only the directed pair passes
    assert(out == Map((1L, 2L) -> 1.0), out.toString)
    // hot-shingle cap: every shared shingle has df 2 > 1 → no pairs
    assert(Dedup.ngramContainmentPairs(docs, "doc_id", "text", 3, 0.1,
      maxShingleDf = Some(1L)).count() == 0)
  }

  // --- Stats.rfmSegments ----------------------------------------------------

  test("rfmSegments: quintile scores rank recency desc, freq/monetary asc") {
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2026-01-0${h}%d 00:00:00")
    // user i has i events, last at day i, value 10*i per event
    val ev = (1 to 5).flatMap(i => (1 to i).map(j =>
      (i.toLong, ts(i), 10.0 * i))).toDF("user_id", "ts", "value")
    val out = Stats.rfmSegments(ev, "user_id", "ts",
        floor(col("value")).cast("long"), buckets = 5)
      .orderBy("user_id").collect()
    // user 5: most recent, most frequent, most monetary → "555"
    assert(out(4).getAs[String]("segment") == "555", out.mkString(","))
    // user 1: oldest (recency 4 days), least frequent/monetary → "111"
    assert(out(0).getAs[String]("segment") == "111")
    assert(out(0).getAs[Long]("recency_days") == 4L)
    assert(out(2).getAs[Long]("frequency") == 3L &&
      out(2).getAs[Long]("monetary") == 90L)
  }

  // --- Stats.trimmedMean ----------------------------------------------------

  test("trimmedMean: excises the alpha tails; alpha=0 is the plain mean") {
    val d = ((1L to 9L) :+ 1000L).map(("g", _)).toDF("grp", "x")
    val r = Stats.trimmedMean(d, "grp", col("x"), alpha = 0.1).collect()(0)
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_kept") == 8L)
    assert(r.getAs[Double]("trimmed_mean") == (2L to 9L).sum.toDouble / 8)
    val r0 = Stats.trimmedMean(d, "grp", col("x"), alpha = 0.0).collect()(0)
    assert(r0.getAs[Double]("trimmed_mean") == 1045.0 / 10)
  }

  test("trimmedMean: dup runs straddling the cut trim partially; " +
      "plan windows over the distinct-value table") {
    // g: [1,1,1,5,9,9,9,9,9,9] n=10, alpha=0.2 → cut=2 → keep ranks 3..8 =
    // one 1, one 5, four 9s → mean 42/6. The value 1 run (ranks 1-3)
    // straddles the low cut; the 9 run (ranks 5-10) straddles the high cut.
    val d = (Seq(1L, 1L, 1L, 5L) ++ Seq.fill(6)(9L)).map(("g", _))
      .toDF("grp", "x")
    val r = Stats.trimmedMean(d, "grp", col("x"), alpha = 0.2).collect()(0)
    assert(r.getAs[Long]("n_kept") == 6L)
    assert(r.getAs[Double]("trimmed_mean") == 42.0 / 6)
    // De-window proof (VERDICT r9 item 3): the sort window's input must be
    // the grouped distinct-value table, not raw rows — i.e. an aggregate
    // sits below the Window in the optimized plan.
    val plan = Stats.trimmedMean(d, "grp", col("x"), alpha = 0.2)
      .queryExecution.optimizedPlan.toString
    val winAt = plan.indexOf("Window")
    val aggBelow = plan.indexOf("Aggregate", winAt)
    assert(winAt >= 0 && aggBelow > winAt,
      s"expected Aggregate BELOW the Window (distinct-value input):\n$plan")
  }

  // --- Clustering.silhouetteSimplified --------------------------------------

  test("silhouetteSimplified: hand values; tight clusters score near 1") {
    val cents = Seq((0, Seq(0L, 0L)), (1, Seq(10L, 0L)))
      .toDF("cell", "centroid")
    val emb = Seq((1L, Seq(0L, 0L)), (2L, Seq(1L, 0L)), (3L, Seq(9L, 0L)))
      .toDF("id", "v")
    val out = Clustering.silhouetteSimplified(emb, "id", "v", cents)
      .orderBy("cell").collect()
    // cell 0: point(0,0) s=1 (a=0,b=10); point(1,0) a=1,b=9 → s=8/9
    assert(out(0).getAs[Long]("n") == 2L)
    assert(math.abs(out(0).getAs[Double]("mean_silhouette") -
      (1.0 + 8.0 / 9) / 2) < 1e-12)
    // cell 1: point(9,0) a=1,b=9 → s=8/9
    assert(math.abs(out(1).getAs[Double]("mean_silhouette") - 8.0 / 9)
      < 1e-12)
  }

  // --- Stats.neymanAllocation -----------------------------------------------

  test("neymanAllocation: budget splits by N_h*S_h; zero-variance draws none") {
    // stratum a: sd 1 (values 0,2 → var 2, sd sqrt2); stratum b: same n,
    // 10x spread → sd 10*sqrt2 → allocation 10:1
    val d = Seq(("a", 0L), ("a", 2L), ("b", 0L), ("b", 20L),
      ("c", 7L)).toDF("s", "x")
    val out = Stats.neymanAllocation(d, "s", col("x"), budget = 1100L)
      .orderBy("s").collect()
    val aAlloc = out(0).getAs[Double]("allocation")
    val bAlloc = out(1).getAs[Double]("allocation")
    assert(math.abs(bAlloc / aAlloc - 10.0) < 1e-9, s"$aAlloc vs $bAlloc")
    assert(math.abs(aAlloc + bAlloc - 1100.0) < 1e-9)
    // singleton stratum: sd 0 → no budget
    assert(out(2).getAs[Double]("allocation") == 0.0)
  }

  // --- Stats.effectiveSampleSize --------------------------------------------

  test("effectiveSampleSize: uniform weights give exactly n; skew collapses it") {
    val uni = Seq(3L, 3L, 3L, 3L).toDF("w")
    val r = Stats.effectiveSampleSize(uni, col("w")).collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Double]("ess") == 4.0)
    val skew = Seq(100L, 1L, 1L).toDF("w")
    val e = Stats.effectiveSampleSize(skew, col("w")).collect()(0)
      .getAs[Double]("ess")
    assert(math.abs(e - 102.0 * 102 / 10002) < 1e-12 && e < 1.1)
  }

  // --- Stats.bestSplit ------------------------------------------------------

  test("bestSplit: recovers a perfectly separating threshold with full gain") {
    val d = ((1L to 40L).map((_, false)) ++ (50L to 90L).map((_, true)))
      .toDF("x", "y")
    val r = Stats.bestSplit(d, col("x"), col("y")).collect()(0)
    assert(r.getAs[Long]("threshold") == 40L, r.toString)
    assert(r.getAs[Long]("pos_left") == 0L &&
      r.getAs[Long]("n_right") == r.getAs[Long]("pos_right"))
    // gain of a perfect split = parent entropy (41/81 positive)
    val p = 41.0 / 81
    val hp = -p * math.log(p) - (1 - p) * math.log(1 - p)
    assert(math.abs(r.getAs[Double]("gain") - hp) < 1e-6, r.toString)
  }

  // --- TextAnalysis.vocabCoverage -------------------------------------------

  test("vocabCoverage: hand curve; k beyond vocab clamps to full coverage") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, "text", Seq(1L, 2L, 10L))
      .orderBy("k").collect()
    // freq: a=3, b=2, c=1; total 6
    assert(out(0).getAs[Long]("covered_tokens") == 3L &&
      out(0).getAs[Double]("coverage") == 0.5)
    assert(out(1).getAs[Long]("covered_tokens") == 5L)
    assert(out(2).getAs[Long]("types_used") == 3L &&
      out(2).getAs[Double]("coverage") == 1.0)
  }

  // --- Sampling.stratifiedFolds ---------------------------------------------

  test("stratifiedFolds: exact per-stratum balance, partition-invariant") {
    val docs = Tables.table(spark, sf0001, "documents")
    val folded = Sampling.stratifiedFolds(docs, "source", "doc_id", k = 5)
    val sizes = folded.groupBy("source", "fold").count()
      .groupBy("source").agg((max("count") - min("count")).as("spread"))
      .collect()
    assert(sizes.forall(_.getAs[Long]("spread") <= 1L), sizes.mkString(","))
    val a = folded.select("doc_id", "fold").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.stratifiedFolds(docs.repartition(7), "source",
        "doc_id", k = 5)
      .select("doc_id", "fold").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  // --- Stats.decayedSum -----------------------------------------------------

  test("decayedSum: dyadic bucket weights, exact halving per half-life") {
    val ts = (d: Int) => new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-02-01 00:00:00").getTime -
        d * 86400000L)
    // group g: 100 at age 0, 60 at age 8d (bucket 1 → /2), 40 at age
    // 15d (bucket 2 → /4)
    val ev = Seq(("g", ts(0), 100L), ("g", ts(8), 60L), ("g", ts(15), 40L))
      .toDF("g", "ts", "x")
    val r = Stats.decayedSum(ev, "g", "ts", col("x"), halfLifeDays = 7L)
      .collect()(0)
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("decayed_sum") == 100.0 + 30.0 + 10.0)
  }

  // --- Stats.modeByGroup ----------------------------------------------------

  test("modeByGroup: most frequent wins; ties break on stringified value") {
    val d = Seq(("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 9L), ("b", 10L)).toDF("g", "x")
    val out = Stats.modeByGroup(d, "g", col("x")).orderBy("g").collect()
    assert(out(0).getAs[String]("mode") == "1" &&
      out(0).getAs[Long]("mode_count") == 2L)
    // tie at count 1: "10" < "9" lexicographically
    assert(out(1).getAs[String]("mode") == "10")
  }

  // --- Funnel.positionCredits -----------------------------------------------

  test("positionCredits: 40/20/40 U-shape, lookback cutoff, credits sum to 1") {
    val t = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:${m}%02d:00")
    val ev = Seq(
      (1L, 10L, "click", t(1)), (1L, 11L, "view", t(2)),
      (1L, 12L, "click", t(3)), (1L, 13L, "purchase", t(10)),
      (2L, 20L, "view", t(5)), (2L, 21L, "purchase", t(6)),
      (3L, 30L, "click", t(0)), (3L, 31L, "purchase", t(50))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = graft.ops.Funnel.positionCredits(ev, "user_id",
        "event_type", "ts", "event_id", "purchase",
        lookbackUs = 30L * 60 * 1000000)
      .collect()
    val byConv = out.groupBy(_.getAs[Long]("conversion_id"))
    // conv 13: three touches → 0.4, 0.2, 0.4 in ts order
    val c13 = byConv(13L).sortBy(_.getAs[Long]("position"))
      .map(_.getAs[Double]("credit")).toSeq
    assert(c13 == Seq(0.4, 0.2, 0.4), c13.toString)
    // conv 21: single touch takes 1.0
    assert(byConv(21L).map(_.getAs[Double]("credit")).toSeq == Seq(1.0))
    // conv 31: the only touch is 50 min before → outside 30-min lookback
    assert(!byConv.contains(31L))
    // credits sum to 1 per attributed conversion
    byConv.values.foreach { rows =>
      assert(math.abs(rows.map(_.getAs[Double]("credit")).sum - 1.0)
        < 1e-12)
    }
  }

  test("positionCredits maxPerUser: cap>=n is identity; capped user " +
      "bounded and deterministic, others untouched") {
    val ev = Tables.events(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame, cap: Int) =
      graft.ops.Funnel.positionCredits(df, "user_id", "event_type",
          "ts", "event_id", "purchase", lookbackUs = 7L * 86400000000L,
          maxPerUser = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val uncapped = run(ev, Int.MaxValue)
    // a cap above every user's event count replays uncapped exactly
    assert(run(ev, 1000000) == uncapped)
    val capped = run(ev, 3)
    // every surviving conversion's touch list is ≤ cap and its
    // credits still sum to 1
    val byConv = capped.groupBy(_._1._1)
    byConv.foreach { case (cid, rows) =>
      assert(rows.size <= 3, s"conversion $cid kept ${rows.size} > cap")
      assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-12, cid)
    }
    // the md5 subsample is a function of the DATA, not the layout
    assert(run(ev.repartition(7, col("user_id")), 3) == capped)
  }

  // --- Stats.powerLawFit ----------------------------------------------------

  test("powerLawFit: hand alpha; all-at-xmin tail is NULL") {
    val d = Seq(5L, 10L).toDF("x")
    val r = Stats.powerLawFit(d, col("x"), xmin = 5L).collect()(0)
    assert(r.getAs[Long]("n") == 2L)
    assert(math.abs(r.getAs[Double]("alpha") - (1.0 + 2.0 / math.log(2)))
      < 1e-6)
    val degen = Seq(5L, 5L).toDF("x")
    assert(Stats.powerLawFit(degen, col("x"), xmin = 5L).collect()(0)
      .isNullAt(2))
  }

  // --- Sampling.ipfWeights --------------------------------------------------

  test("ipfWeights: raked margins converge toward uniform on both axes") {
    val d = (Seq.fill(60)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c")
    val w = Sampling.ipfWeights(d, "r", "c", iters = 8)
    val cells = w.collect().map(x => (x.getString(0), x.getString(1),
      x.getLong(2), x.getDouble(3)))
    val rowMass = cells.groupBy(_._1).map { case (k, v) =>
      k -> v.map(t => t._3 * t._4).sum }
    val colMass = cells.groupBy(_._2).map { case (k, v) =>
      k -> v.map(t => t._3 * t._4).sum }
    // uniform target: 100/2 = 50 per row category and per col category
    rowMass.values.foreach(m => assert(math.abs(m - 50.0) < 0.5, rowMass))
    colMass.values.foreach(m => assert(math.abs(m - 50.0) < 0.5, colMass))
  }

  test("ipfWeights maxCells: over-bound category product fails fast " +
      "with the mis-specification message, not a driver collect") {
    val d = (for (r <- 0 until 6; c <- 0 until 4)
      yield (s"r$r", s"c$c")).toDF("r", "c") // 24 distinct cells
    val e = intercept[IllegalArgumentException] {
      Sampling.ipfWeights(d, "r", "c", iters = 1, maxCells = 10)
    }
    assert(e.getMessage.contains("24 distinct") &&
      e.getMessage.contains("maxCells=10"), e.getMessage)
    // at the bound it runs; results identical to the unguarded default
    assert(Sampling.ipfWeights(d, "r", "c", iters = 1, maxCells = 24)
      .count() == 24L)
  }

  // --- Stats.anovaF ---------------------------------------------------------

  test("anovaF: textbook hand F and eta2; equal means give F ~ 0") {
    // groups {1,2,3}, {2,3,4}, {5,6,7}: means 2/3/6, grand 11/3 →
    // SS_between = 3·(25+4+49)/9 = 26, SS_within = 6, SS_total = 32
    val d = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L), ("c", 7L)).toDF("g", "x")
    val r = Stats.anovaF(d, "g", col("x")).collect()(0)
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 9L)
    assert(math.abs(r.getAs[Double]("f_stat") - (26.0 / 2) / (6.0 / 6))
      < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("eta_sq") - 26.0 / 32) < 1e-9)
    val flat = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L))
      .toDF("g", "x")
    assert(math.abs(Stats.anovaF(flat, "g", col("x")).collect()(0)
      .getAs[Double]("f_stat")) < 1e-12)
  }

  // --- TextAnalysis.vocabOverlap --------------------------------------------

  test("vocabOverlap: hand Jaccard; minDf prunes singleton types") {
    val docs = Seq(("a", "x y z"), ("a", "x y"), ("b", "x y w"),
      ("c", "p q")).toDF("g", "text")
    val out = TextAnalysis.vocabOverlap(docs, "g", "text")
      .collect().map(r => (r.getAs[String]("group_a"),
        r.getAs[String]("group_b")) -> r).toMap
    // V_a = {x,y,z}, V_b = {x,y,w} → shared 2, union 4
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("shared") == 2L &&
      ab.getAs[Double]("jaccard") == 0.5)
    // c shares nothing → pairs with c absent entirely
    assert(!out.contains(("a", "c")) && !out.contains(("b", "c")))
    // minDf = 2: only types seen twice within a group survive —
    // a keeps {x,y}, b keeps nothing → no pairs at all
    assert(TextAnalysis.vocabOverlap(docs, "g", "text", minDf = 2L)
      .count() == 0)
  }

  // --- Drift.distributionDistances ------------------------------------------

  test("distributionDistances: identical → 0 TV / BC 1; disjoint → TV 1 / BC 0") {
    val a = Seq("x", "x", "y", "z").toDF("t")
    val same = Drift.distributionDistances(a, a, "t").collect()(0)
    assert(same.getAs[Double]("total_variation") == 0.0)
    assert(math.abs(same.getAs[Double]("bhattacharyya") - 1.0) < 1e-12)
    assert(math.abs(same.getAs[Double]("hellinger_sq")) < 1e-12)
    val dis = Drift.distributionDistances(Seq("p", "q").toDF("t"),
      Seq("r", "s").toDF("t"), "t").collect()(0)
    assert(dis.getAs[Double]("total_variation") == 1.0 &&
      dis.getAs[Double]("bhattacharyya") == 0.0)
    // hand value: p = {x:1}, q = {x:.5, y:.5} → TV .5, BC √.5
    val h = Drift.distributionDistances(Seq("x", "x").toDF("t"),
      Seq("x", "y").toDF("t"), "t").collect()(0)
    assert(h.getAs[Double]("total_variation") == 0.5)
    assert(math.abs(h.getAs[Double]("bhattacharyya") - math.sqrt(0.5))
      < 1e-12)
  }

  // --- Stats.cochranArmitage / kendallTauB / runsTest -----------------------

  test("cochranArmitage: monotone rates large z2; flat rates ~0") {
    // rate rises 10% → 50% across scores 1..5, 100 per group
    val up = (1 to 5).flatMap { w =>
      (1 to 100).map(i => (w.toLong, i <= w * 10)) }.toDF("w", "y")
    val r = Stats.cochranArmitage(up, col("w"), col("y")).collect()(0)
    assert(r.getAs[Double]("z2") > 40, r.toString) // hand: ~47.6
    val flat = (1 to 5).flatMap { w =>
      (1 to 100).map(i => (w.toLong, i <= 30)) }.toDF("w", "y")
    assert(Stats.cochranArmitage(flat, col("w"), col("y")).collect()(0)
      .getAs[Double]("z2") < 1e-9)
  }

  test("kendallTauB: monotone +1, reversed -1, ties corrected") {
    // sqrt(n0)·sqrt(n0) can miss n0 by an ulp, so tolerance not equality
    val mono = (1L to 10L).map(i => (i, i * 2)).toDF("x", "y")
    assert(math.abs(Stats.kendallTauB(mono, col("x"), col("y"))
      .collect()(0).getAs[Double]("tau_b") - 1.0) < 1e-12)
    val rev = (1L to 10L).map(i => (i, -i)).toDF("x", "y")
    assert(math.abs(Stats.kendallTauB(rev, col("x"), col("y"))
      .collect()(0).getAs[Double]("tau_b") + 1.0) < 1e-12)
    // hand 2x2 with ties: x∈{0,1}, y∈{0,1}, diag-heavy
    val t22 = (Seq.fill(30)((0L, 0L)) ++ Seq.fill(10)((0L, 1L)) ++
      Seq.fill(10)((1L, 0L)) ++ Seq.fill(30)((1L, 1L))).toDF("x", "y")
    val r = Stats.kendallTauB(t22, col("x"), col("y")).collect()(0)
    assert(r.getAs[Long]("concordant") == 900L &&
      r.getAs[Long]("discordant") == 100L)
    // n0 = 3160, n1 = n2 = Σ40·39/2·2 = 1560 → τ = 800/1600 = 0.5
    assert(r.getAs[Double]("tau_b") == 0.5, r.toString)
  }

  test("runsTest: alternating sequence z >> 0; blocked sequence z << 0") {
    val ts = (i: Int) => new java.sql.Timestamp(i * 1000L)
    val alt = (0 until 40).map(i => (ts(i), i.toLong, i % 2 == 0))
      .toDF("ts", "id", "f")
    val ra = Stats.runsTest(alt, "ts", "id", col("f")).collect()(0)
    assert(ra.getAs[Long]("runs") == 40L && ra.getAs[Double]("z") > 4)
    val blocked = (0 until 40).map(i => (ts(i), i.toLong, i < 20))
      .toDF("ts", "id", "f")
    val rb = Stats.runsTest(blocked, "ts", "id", col("f")).collect()(0)
    assert(rb.getAs[Long]("runs") == 2L && rb.getAs[Double]("z") < -4)
    // single-symbol sequence: undefined, NULL not crash
    val mono = (0 until 9).map(i => (ts(i), i.toLong, true)).toDF("ts", "id", "f")
    assert(Stats.runsTest(mono, "ts", "id", col("f")).collect()(0)
      .isNullAt(4))
  }

  // --- Stats.cronbachAlpha / cohensD / pairedT ------------------------------

  test("cronbachAlpha: parallel items score high; independent items low") {
    // three noisy copies of one latent score → high alpha
    val good = (1 to 60).map { i =>
      val z = (i % 10).toLong
      (z + i % 2, z + (i / 2) % 2, z + (i / 3) % 2) }
      .toDF("a", "b", "c")
    val ga = Stats.cronbachAlpha(good,
      Seq(col("a"), col("b"), col("c"))).collect()(0)
    assert(ga.getAs[Long]("k") == 3L &&
      ga.getAs[Double]("alpha") > 0.8, ga.toString)
    // independent items → alpha near 0 (can be negative)
    val bad = (1 to 60).map(i =>
      ((i % 7).toLong, ((i * 3) % 5).toLong, ((i * 11) % 4).toLong))
      .toDF("a", "b", "c")
    assert(Stats.cronbachAlpha(bad, Seq(col("a"), col("b"), col("c")))
      .collect()(0).getAs[Double]("alpha") < 0.4)
  }

  test("cohensD: hand effect size; Hedges shrinks toward zero") {
    // arm1 mean 12, arm2 mean 10, both sd via hand moments
    val d = (Seq(10L, 12L, 14L).map((true, _)) ++
      Seq(9L, 10L, 11L).map((false, _))).toDF("a", "x")
    val r = Stats.cohensD(d, col("a"), col("x")).collect()(0)
    // css1 = 8, css2 = 2, pooled var = 10/4 = 2.5 → d = 2/sqrt(2.5)
    assert(math.abs(r.getAs[Double]("d") - 2.0 / math.sqrt(2.5)) < 1e-12)
    val g = r.getAs[Double]("hedges_g")
    assert(math.abs(g) < math.abs(r.getAs[Double]("d")) && g > 0)
    // a 1-row arm is NULL, not a crash
    val tiny = Seq((true, 5L), (false, 1L), (false, 2L)).toDF("a", "x")
    assert(Stats.cohensD(tiny, col("a"), col("x")).collect()(0).isNullAt(4))
    // zero pooled variance with DIFFERENT means: NULL, not ±Infinity
    // (ADVICE r9 guard; the q274 oracle carries the matching CASE so
    // both engines agree on the degenerate input)
    val const = Seq((true, 5L), (true, 5L), (false, 2L), (false, 2L))
      .toDF("a", "x")
    val rc = Stats.cohensD(const, col("a"), col("x")).collect()(0)
    assert(rc.isNullAt(4) && rc.isNullAt(5), rc.toString)
  }

  test("pairedT: planted constant shift detected; keys missing a side drop") {
    // every key: condition-true values exactly 5 higher (+ tiny wiggle)
    val rows = (1L to 12L).flatMap { k =>
      Seq((k, true, 20L + k + (k % 2)), (k, true, 22L + k),
        (k, false, 16L + k), (k, false, 17L + k + (k % 3)))
    }.toDF("k", "c", "x")
    val r = Stats.pairedT(rows, "k", col("c"), col("x")).collect()(0)
    assert(r.getAs[Long]("n") == 12L)
    assert(r.getAs[Double]("mean_diff") > 4.0 &&
      r.getAs[Double]("t") > 10.0, r.toString)
    // a key with only one condition is excluded from the pairing
    val withLoner = rows.unionByName(Seq((99L, true, 100L))
      .toDF("k", "c", "x"))
    assert(Stats.pairedT(withLoner, "k", col("c"), col("x"))
      .collect()(0).getAs[Long]("n") == 12L)
  }

  // --- Stats.corrTest / partialCorr -----------------------------------------

  test("corrTest: known r and t; degenerate and perfect cases NULL") {
    val d = Seq((1L, 2L), (2L, 3L), (3L, 5L), (4L, 4L), (5L, 6L))
      .toDF("x", "y")
    val r = Stats.corrTest(d, col("x"), col("y")).collect()(0)
    val want = d.stat.corr("x", "y")
    assert(math.abs(r.getAs[Double]("r") - want) < 1e-12)
    val t = want * math.sqrt(3 / (1 - want * want))
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-9)
    // perfectly linear: r lands within an ulp of 1 (sqrt·sqrt in the
    // denominator), so t is finite-but-huge — the r*r >= 1 guard only
    // fires on EXACT ±1 (possible when dx·dy is a perfect square)
    val lin = (1L to 5L).map(i => (i, 2 * i)).toDF("x", "y")
    val rl = Stats.corrTest(lin, col("x"), col("y")).collect()(0)
    assert(math.abs(rl.getAs[Double]("r") - 1.0) < 1e-12)
    assert(rl.isNullAt(2) || rl.getAs[Double]("t") > 1e6)
    // constant margin → NULL r
    val const = Seq((1L, 7L), (2L, 7L)).toDF("x", "y")
    assert(Stats.corrTest(const, col("x"), col("y")).collect()(0)
      .isNullAt(1))
  }

  test("partialCorr: x->z->y chain vanishes once z is controlled") {
    // x = z + small noise, y = z exactly: r_xy high, but x ⊥ y | z
    val rows = (1 to 40).map { i =>
      val z = i.toLong
      (z + (if (i % 2 == 0) 1L else -1L), z, z) }
      .toDF("x", "y", "z")
    val r = Stats.partialCorr(rows, col("x"), col("y"), col("z"))
      .collect()(0)
    assert(r.getAs[Double]("r_xy") > 0.99)
    // y = z exactly → r_yz = 1 → partial undefined (NULL), the honest
    // answer for a deterministic confounder
    assert(r.isNullAt(4))
    // soften: y = z + independent ±1 noise on a different phase
    val rows2 = (1 to 40).map { i =>
      val z = i.toLong
      (z + (if (i % 2 == 0) 1L else -1L), z +
        (if (i % 4 < 2) 1L else -1L), z) }.toDF("x", "y", "z")
    val r2 = Stats.partialCorr(rows2, col("x"), col("y"), col("z"))
      .collect()(0)
    assert(r2.getAs[Double]("r_xy") > 0.99)
    assert(math.abs(r2.getAs[Double]("r_xy_given_z")) < 0.35,
      r2.toString)
  }

  // --- TextAnalysis.fightinWords --------------------------------------------

  test("fightinWords: over-used token scores positive z; shared token ~0") {
    val a = Seq.fill(50)("alpha shared").toDF("text")
    val b = Seq.fill(50)("beta shared").toDF("text")
    val out = TextAnalysis.fightinWords(a, b, "text", alpha0 = 10.0)
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    assert(out("alpha").getAs[Double]("z") > 2,
      out("alpha").toString)
    assert(out("beta").getAs[Double]("z") < -2)
    assert(math.abs(out("shared").getAs[Double]("z")) < 0.5)
    // antisymmetry: swapping the corpora flips the sign
    val sw = TextAnalysis.fightinWords(b, a, "text", alpha0 = 10.0)
      .collect().map(r => r.getAs[String]("token") ->
        r.getAs[Double]("z")).toMap
    assert(math.abs(sw("alpha") + out("alpha").getAs[Double]("z")) < 1e-9)
  }

  // --- Stats.oddsRatio ------------------------------------------------------

  test("oddsRatio: hand OR/CI; zero cell triggers the 0.5 correction") {
    val d = (Seq.fill(30)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(15)((false, true)) ++ Seq.fill(45)((false, false)))
      .toDF("e", "o")
    val r = Stats.oddsRatio(d, col("e"), col("o")).collect()(0)
    assert(r.getAs[Double]("odds_ratio") == 30.0 * 45 / (10.0 * 15))
    assert(!r.getAs[Boolean]("corrected"))
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("odds_ratio") &&
      r.getAs[Double]("odds_ratio") < r.getAs[Double]("ci_hi"))
    // CI matches the hand Woolf interval within the 2^-26 grid
    val se = math.sqrt(1.0 / 30 + 1.0 / 10 + 1.0 / 15 + 1.0 / 45)
    val lnOr = math.floor(math.log(9.0) * 67108864.0) / 67108864.0
    assert(math.abs(r.getAs[Double]("ci_hi") -
      math.exp(lnOr + 1.96 * se)) < 1e-6)
    val zc = (Seq.fill(10)((true, true)) ++ Seq.fill(10)((false, false)) ++
      Seq.fill(5)((false, true))).toDF("e", "o")
    assert(Stats.oddsRatio(zc, col("e"), col("o")).collect()(0)
      .getAs[Boolean]("corrected"))
  }

  // --- TextAnalysis.tokenBurstiness -----------------------------------------

  test("tokenBurstiness: even token ~Fano<=1, clumped token Fano>1") {
    // 'the' once in every doc (variance 0); 'topic' 4x in one doc
    val docs = (1L to 8L).map(i =>
      (i, if (i == 1) "the topic topic topic topic" else "the filler"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenBurstiness(docs, "doc_id", "text", 10)
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    val the = out("the")
    assert(the.getAs[Double]("mean") == 1.0 &&
      the.getAs[Double]("variance") == 0.0)
    val topic = out("topic")
    // mean 0.5, var = (8·16 − 16)/(8·7) = 2 → fano 4
    assert(topic.getAs[Double]("mean") == 0.5)
    assert(topic.getAs[Double]("fano") == 4.0, topic.toString)
  }

  // --- Stats.pearsonResiduals -----------------------------------------------

  test("pearsonResiduals: independent table ~0; planted cell stands out") {
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 25 } yield (a, b)).toDF("a", "b")
    val r0 = Stats.pearsonResiduals(ind, "a", "b").collect()
    assert(r0.forall(r => math.abs(r.getAs[Double]("residual")) < 1e-12))
    // shift mass into (x,p): its residual positive, (x,q) negative
    val dep = (Seq.fill(40)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(40)(("y", "q"))).toDF("a", "b")
    val m = Stats.pearsonResiduals(dep, "a", "b").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Double]("residual")).toMap
    assert(m(("x", "p")) > 2 && m(("x", "q")) < -2)
    assert(math.abs(m(("x", "p")) + m(("x", "q"))) < 1e-9,
      "2x2 residuals are ± the same magnitude")
  }

  // --- Stats.multinomialGof / herfindahl ------------------------------------

  test("multinomialGof: perfect mix gives 0; absent category inflates chi2") {
    val d = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("cat")
    val fit = Stats.multinomialGof(d, "cat",
      Seq(("a", 0.5), ("b", 0.3), ("c", 0.2))).collect()(0)
    assert(fit.getAs[Long]("k") == 3L && fit.getAs[Double]("chi2") == 0.0)
    // target expects a 'd' slice that is entirely absent
    val miss = Stats.multinomialGof(d, "cat",
      Seq(("a", 0.4), ("b", 0.3), ("c", 0.2), ("d", 0.1))).collect()(0)
    assert(miss.getAs[Long]("k") == 4L)
    // absent category contributes its full N·p term: chi2 ≥ N·0.1
    assert(miss.getAs[Double]("chi2") >= 100 * 0.1)
    // an observed category the recipe doesn't know fails loudly
    intercept[Exception] {
      Stats.multinomialGof(d, "cat", Seq(("a", 0.5), ("b", 0.5)))
        .collect()
    }
  }

  test("herfindahl: uniform gives 1/k; monopoly gives 1") {
    val uni = (1 to 40).map(i => s"s${i % 4}").toDF("c")
    val u = Stats.herfindahl(uni, "c").collect()(0)
    assert(u.getAs[Double]("hhi") == 0.25 &&
      u.getAs[Double]("effective_categories") == 4.0)
    val mono = Seq.fill(7)("only").toDF("c")
    assert(Stats.herfindahl(mono, "c").collect()(0)
      .getAs[Double]("hhi") == 1.0)
  }

  // --- Resample.classicalDecompose ------------------------------------------

  test("classicalDecompose: recovers a planted trend+seasonal exactly") {
    // y = 100·day + dow-indexed bump; 28 dense days
    val bump = Array(70L, -10L, -10L, -10L, -10L, -10L, -20L)
    val ts = (d: Int) => new java.sql.Timestamp(d * 86400000L)
    val rows = (0 until 28).map { d =>
      (ts(d), 100L * d + bump(d % 7)) }.toDF("ts", "x")
    val out = graft.ops.Resample.classicalDecompose(rows, "ts",
        col("x"), period = 7)
      .orderBy("day").collect()
    // edges (first/last 3 days) carry no trend
    assert(out.take(3).forall(_.isNullAt(3)) &&
      out.takeRight(3).forall(_.isNullAt(3)))
    // interior: the 7-day MA of a linear trend is exact (the bump sums
    // to 0 over any full period), so trend = 100·day and the seasonal
    // recovers the centered bump; remainder 0
    val mid = out(10)
    assert(mid.getAs[Double]("trend") == 100.0 * mid.getAs[Long]("day"))
    val bumpMean = bump.sum.toDouble / 7
    out.filter(!_.isNullAt(3)).foreach { r =>
      val want = bump((r.getAs[Long]("dop") % 7).toInt) - bumpMean
      assert(math.abs(r.getAs[Double]("seasonal") - want) < 1e-9, r.toString)
      assert(math.abs(r.getAs[Double]("remainder")) < 1e-9, r.toString)
    }
  }

  // --- Sampling.rollingOriginFolds ------------------------------------------

  test("rollingOriginFolds: expanding windows, no future leak, bounded scope") {
    val ts = (d: Int) => new java.sql.Timestamp(d * 86400000L)
    val ev = (0 to 9).map(d => (d.toLong, ts(d))).toDF("id", "ts")
    val out = Sampling.rollingOriginFolds(ev, "ts", folds = 2,
        horizonDays = 2L, stepDays = 3L)
      .select("id", "fold", "role").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // end day 9: fold 0 cut=7 (train ≤7, test 8-9); fold 1 cut=4
    // (train ≤4, test 5-6; days 7-9 out of scope)
    val f0 = out.filter(_._2 == 0L)
    assert(f0.filter(_._3 == "train").map(_._1).max == 7L)
    assert(f0.filter(_._3 == "test").map(_._1).toSet == Set(8L, 9L))
    val f1 = out.filter(_._2 == 1L)
    assert(f1.filter(_._3 == "train").map(_._1).max == 4L)
    assert(f1.filter(_._3 == "test").map(_._1).toSet == Set(5L, 6L))
    assert(!f1.exists(_._1 > 6L), "rows after fold 1's window leak in")
    // every fold's train strictly precedes its test (no future leak)
    Seq(f0, f1).foreach { f =>
      val maxTrain = f.filter(_._3 == "train").map(_._1).max
      val minTest = f.filter(_._3 == "test").map(_._1).min
      assert(maxTrain < minTest)
    }
  }

  // --- Stats.ebShrinkRates --------------------------------------------------

  test("ebShrinkRates: small keys pull to the mean, big keys barely move") {
    // keys with rates {0.2 × 1000 trials, 0.8 × 1000, 1.0 × 2 trials}
    val rows = (Seq.fill(200)(("a", true)) ++ Seq.fill(800)(("a", false)) ++
      Seq.fill(800)(("b", true)) ++ Seq.fill(200)(("b", false)) ++
      Seq.fill(2)(("c", true))).toDF("k", "s")
    val out = Stats.ebShrinkRates(rows, "k", col("s"))
      .orderBy("k").collect()
    val (ra, rb, rc) = (out(0), out(1), out(2))
    assert(ra.getAs[Double]("rate") == 0.2 && rc.getAs[Double]("rate") == 1.0)
    val shrunkC = rc.getAs[Double]("shrunk_rate")
    // the 2-trial perfect key moves toward the prior mean (the MoM
    // prior is weak here — the dispersed rates imply little pooling —
    // so direction and RELATIVE magnitude are the contract), and the
    // 1000-trial keys move less than the 2-trial key
    assert(shrunkC < 1.0 && shrunkC > rc.getAs[Double]("alpha") /
      (rc.getAs[Double]("alpha") + rc.getAs[Double]("beta")))
    val deltaC = 1.0 - shrunkC
    val deltaA = math.abs(ra.getAs[Double]("shrunk_rate") - 0.2)
    assert(deltaC > 10 * deltaA, s"deltaC $deltaC vs deltaA $deltaA")
    assert(math.abs(ra.getAs[Double]("shrunk_rate") - 0.2) < 0.01)
    assert(math.abs(rb.getAs[Double]("shrunk_rate") - 0.8) < 0.01)
    // all keys share one fitted prior
    assert(ra.getAs[Double]("alpha") == rc.getAs[Double]("alpha"))
    // degenerate: identical rates → zero variance → NULL prior, raw rates
    val flat = Seq(("a", true), ("a", false), ("b", true), ("b", false))
      .toDF("k", "s")
    val f = Stats.ebShrinkRates(flat, "k", col("s")).collect()(0)
    assert(f.isNullAt(4) && f.getAs[Double]("shrunk_rate") == 0.5)
  }

  // --- FuzzyJoin.fellegiSunter ----------------------------------------------

  test("fellegiSunter: hand weights and three-way decision") {
    val pairs = Seq((1L, 2L, true, true), (3L, 4L, true, false),
      (5L, 6L, false, false)).toDF("a", "b", "f1", "f2")
    val out = graft.ops.FuzzyJoin.fellegiSunter(pairs,
        Seq(("f1", 0.9, 0.1), ("f2", 0.8, 0.2)),
        lower = 0.0, upper = 3.0)
      .orderBy("a").collect()
    def lnq(x: Double) = math.floor(math.log(x) * 67108864.0) / 67108864.0
    val w12 = lnq(0.9 / 0.1) + lnq(0.8 / 0.2)
    val w34 = lnq(0.9 / 0.1) + lnq(0.2 / 0.8)
    val w56 = lnq(0.1 / 0.9) + lnq(0.2 / 0.8)
    assert(math.abs(out(0).getAs[Double]("match_weight") - w12) < 1e-12)
    assert(out(0).getAs[String]("decision") == "match")
    assert(math.abs(out(1).getAs[Double]("match_weight") - w34) < 1e-12)
    assert(out(1).getAs[String]("decision") == "review")
    assert(out(2).getAs[String]("decision") == "non_match", w56.toString)
  }

  // --- Components.bfsDistances ----------------------------------------------

  test("bfsDistances: hop counts on a path graph, cutoff, unreached absent") {
    // path 1-2-3-4-5-6, island 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("s")
    val got = Components.bfsDistances(edges, "a", "b", seeds, "s",
        maxHops = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("hops"))
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), got.toString)
    // two seeds: min-hop wins where frontiers meet
    val got2 = Components.bfsDistances(edges, "a", "b",
        Seq(1L, 6L).toDF("s"), "s", maxHops = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("hops"))
      .toMap
    assert(got2(4L) == 2L && got2(3L) == 2L && !got2.contains(10L))
  }

  // --- Stats.ipsOffPolicy ---------------------------------------------------

  test("ipsOffPolicy: hand IPS/SNIPS; no matches gives NULL snips") {
    // 4 logged rows, ipw 2; policy matches rows with r=10 and r=30
    val d = Seq((true, 10L), (false, 99L), (true, 30L), (false, 7L))
      .toDF("m", "r")
    val out = Stats.ipsOffPolicy(d, col("m"), col("r"), lit(3L))
      .collect()(0)
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("n_matched") == 2L)
    // ips divides by n (unbiased), snips by the matched weight mass
    assert(out.getAs[Double]("ips") == (10.0 * 3 + 30 * 3) / 4)
    assert(out.getAs[Double]("snips") == (10.0 * 3 + 30 * 3) / 6.0)
    val none = Stats.ipsOffPolicy(d, lit(false), col("r"), lit(3L))
      .collect()(0)
    assert(none.isNullAt(3) && none.getAs[Double]("ips") == 0.0)
  }

  // --- Stats.trendByKey -----------------------------------------------------

  test("trendByKey: exact hand slopes; degenerate keys are NULL") {
    val ts = (d: Int) => new java.sql.Timestamp(d * 86400000L)
    val ev = Seq(
      (1L, ts(0), 10L), (1L, ts(1), 20L), (1L, ts(2), 30L), // slope 10
      (2L, ts(0), 5L), (2L, ts(2), 1L),                     // slope -2
      (3L, ts(1), 7L),                                      // n=1 → NULL
      (4L, ts(3), 1L), (4L, ts(3), 9L)                      // zero t-var
    ).toDF("k", "ts", "x")
    val out = Stats.trendByKey(ev, "k", "ts", col("x"))
      .orderBy("k").collect()
    assert(out(0).getAs[Double]("slope") == 10.0)
    assert(out(1).getAs[Double]("slope") == -2.0)
    assert(out(2).isNullAt(2) && out(3).isNullAt(2))
  }

  // --- Funnel.cohortLtv -----------------------------------------------------

  test("cohortLtv: cumulative per-user value by cohort week") {
    val wk = 604800000L // ms per week
    val t = (w: Int) => new java.sql.Timestamp(w * wk)
    val ev = Seq(
      (1L, t(0), 100L), (1L, t(1), 50L),   // cohort 0
      (2L, t(0), 200L),                    // cohort 0
      (3L, t(1), 80L), (3L, t(1), 20L)     // cohort 1
    ).toDF("u", "ts", "v")
    val out = graft.ops.Funnel.cohortLtv(ev, "u", "ts", col("v"))
      .orderBy("cohort_week", "week_offset").collect()
    // cohort 0: offset 0 revenue 300 (2 users), offset 1 revenue 50
    assert(out(0).getAs[Long]("revenue") == 300L &&
      out(0).getAs[Long]("users") == 2L &&
      out(0).getAs[Double]("cum_ltv_per_user") == 150.0)
    assert(out(1).getAs[Long]("cum_revenue") == 350L &&
      out(1).getAs[Double]("cum_ltv_per_user") == 175.0)
    // cohort 1: one user, one week, revenue 100
    assert(out(2).getAs[Long]("cohort_week") == 1L &&
      out(2).getAs[Double]("cum_ltv_per_user") == 100.0)
  }

  // --- Quality.pseudonymize -------------------------------------------------

  test("pseudonymize: stable tokens preserve joins; nulls stay null") {
    val a = Seq((1L, Some("alice")), (2L, Some("bob")),
      (3L, None: Option[String])).toDF("id", "name")
    val p = Quality.pseudonymize(a, Seq("name"), "k1")
    val rows = p.orderBy("id").collect()
    assert(rows(0).getString(1).length == 64) // sha-256 hex
    assert(rows(2).isNullAt(1))
    // same value → same token (join-preserving), across frames
    val b = Seq((9L, "alice")).toDF("id", "name")
    val pb = Quality.pseudonymize(b, Seq("name"), "k1").collect()(0)
    assert(pb.getString(1) == rows(0).getString(1))
    // different secret → different token space
    val p2 = Quality.pseudonymize(a, Seq("name"), "k2")
      .orderBy("id").collect()
    assert(p2(0).getString(1) != rows(0).getString(1))
  }

  // --- Stats.cusumOnline ----------------------------------------------------

  test("cusumOnline: closed prefix form equals the Page recursion") {
    // one key, drifts chosen to exercise reset-to-zero and excursion
    val xs = Seq(5L, 1L, 9L, 9L, 9L, 0L, 0L, 9L)
    val df = xs.zipWithIndex.map { case (x, i) =>
      (1L, i.toLong, i.toLong, x) }.toDF("k", "t", "id", "x")
    val got = Stats.cusumOnline(df, "k", "t", "id", col("x"),
        target = 4L, slack = 1L, threshold = 5L)
      .orderBy("t").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("cusum_stat")))
    // driver replay of s_t = max(0, s + (x - 5))
    var s = 0L
    val want = xs.zipWithIndex.flatMap { case (x, i) =>
      s = math.max(0L, s + (x - 5L))
      if (s >= 5L) Some((i.toLong, s)) else None
    }
    assert(got.toSeq == want, s"got ${got.mkString(",")}")
  }

  // --- TextAnalysis.readability ---------------------------------------------

  test("readability: hand-counted words/sentences/syllables and score") {
    val docs = Seq((1L, "the cat sat. it sat on a mat!"),
      (2L, ""), (3L, "pfft grr")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // empty doc filtered (no words)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val r = out(0)
    assert(r.getAs[Long]("n_words") == 8L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    // syllable vowel-groups: the(1) cat(1) sat(1) it(1) sat(1) on(1)
    // a(1) mat(1) = 8
    assert(r.getAs[Long]("n_syllables") == 8L)
    val expected = 206.835 - 1.015 * (8.0 / 2) - 84.6 * (8.0 / 8)
    assert(r.getAs[Double]("flesch") == expected)
    // no vowels → 0 syllables, sentence floor at 1
    assert(out(1).getAs[Long]("n_syllables") == 0L &&
      out(1).getAs[Long]("n_sentences") == 1L)
  }

  test("entropyByKey: uniform = ln k, single category = +0.0, " +
      "hand-computed skewed case") {
    import spark.implicits._
    val df = (Seq.fill(5)(("u", "a")) ++ Seq.fill(5)(("u", "b")) ++
      Seq.fill(5)(("u", "c")) ++ Seq.fill(5)(("u", "d")) ++
      Seq.fill(9)(("s", "x")) ++
      Seq.fill(3)(("k", "a")) ++ Seq.fill(1)(("k", "b")))
      .toDF("grp", "cat")
    val got = graft.ops.Stats.entropyByKey(df, "grp", "cat")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // uniform over 4 categories: H = ln 4 (to lnq grid resolution)
    assert(got("u")._1 == 20L && got("u")._2 == 4L)
    assert(math.abs(got("u")._3 - math.log(4.0)) < 1e-6, got("u"))
    // one category: exactly +0.0 (not -0.0 -- the 0.0-minus guard)
    assert(got("s") == ((9L, 1L, 0.0)))
    assert(1.0 / got("s")._3 > 0, "entropy of one category must be +0.0")
    // skewed hand case: -(0.75 ln 0.75 + 0.25 ln 0.25)
    val expK = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(got("k")._3 - expK) < 1e-6, got("k"))
  }

  test("weightedMedianByKey: hand cases incl. the lower-median " +
      "boundary; weight-1 degenerates to the plain lower median") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 1L), // W=4, cum(2)=3 -> 2
      ("b", 1L, 1L), ("b", 2L, 1L),                // W=2, 2*1>=2   -> 1
      ("c", 10L, 5L), ("c", 99L, 1L),              // heavy low     -> 10
      ("d", 7L, 3L))                               // single value  -> 7
      .toDF("grp", "v", "w")
    val got = graft.ops.Stats.weightedMedianByKey(df, "grp",
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.col("w"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> ((2L, 4L)), "b" -> ((1L, 2L)),
      "c" -> ((10L, 6L)), "d" -> ((7L, 3L))))
  }

  test("logRank: hand-computed 2x2 arms; identical arms read chi2 = 0; " +
      "censored subjects enter at-risk but not deaths") {
    import spark.implicits._
    // arm1: die at 1, 2; arm2: die at 1, 3
    // t=1: d=2 d1=1 n=4 n1=2 -> E1 += 1,   V += 16/48 = 1/3
    // t=2: d=1 d1=1 n=2 n1=1 -> E1 += 0.5, V += 1/4
    // t=3: d=1 d1=0 n=1 n1=0 -> E1 += 0,   V += 0 (n <= 1)
    // chi2 = (2 - 1.5)^2 / (7/12) = 3/7
    val df = Seq((1L, true, true), (2L, true, true),
      (1L, true, false), (3L, true, false))
      .toDF("dur", "obs", "arm")
    val r = Survival.logRank(df, "dur", "obs", col("arm")).collect()(0)
    assert(r.getAs[Long]("n_times") == 3L)
    assert(r.getAs[Long]("o1") == 2L)
    assert(math.abs(r.getAs[Double]("e1") - 1.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("v") - 7.0 / 12) < 1e-12)
    assert(math.abs(r.getAs[Double]("chi2") - 3.0 / 7) < 1e-12, r)
    // identical curves -> O1 = E1 exactly -> chi2 = 0
    val same = Seq((1L, true, true), (2L, true, true),
      (1L, true, false), (2L, true, false)).toDF("dur", "obs", "arm")
    val r2 = Survival.logRank(same, "dur", "obs", col("arm")).collect()(0)
    assert(r2.getAs[Double]("chi2") == 0.0, r2)
    // a censored arm2 subject at t=5 raises n at every t<=5 but adds
    // no death: t=1 has n=5 n1=2 -> E1 += 2*2/5 = 0.8; t=2 has n=3
    // n1=1 -> E1 += 1/3; t=3 has n1=0 -> E1 += 0
    val cen = df.union(Seq((5L, false, false)).toDF("dur", "obs", "arm"))
    val r3 = Survival.logRank(cen, "dur", "obs", col("arm")).collect()(0)
    assert(r3.getAs[Long]("o1") == 2L)
    assert(math.abs(r3.getAs[Double]("e1") - (0.8 + 1.0 / 3)) < 1e-12, r3)
  }

  test("degreeAssortativity: star = -1, triangle+edge = +1, " +
      "regular graph = NULL") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val rs = Components.degreeAssortativity(star, "a", "b").collect()(0)
    assert(rs.getAs[Long]("m_directed") == 6L)
    assert(math.abs(rs.getAs[Double]("r") - (-1.0)) < 1e-12, rs)
    // disjoint triangle (all deg 2) + edge (all deg 1): every directed
    // edge pairs equal degrees -> perfectly assortative
    val mixed = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("a", "b")
    val rm = Components.degreeAssortativity(mixed, "a", "b").collect()(0)
    assert(math.abs(rm.getAs[Double]("r") - 1.0) < 1e-12, rm)
    // 4-cycle: constant degree -> zero variance -> NULL
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val rc = Components.degreeAssortativity(cyc, "a", "b").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("r")), rc)
  }

  test("lexicalDiversity: hand type table; double spaces drop empty " +
      "tokens; all-hapax slice reads K = 0") {
    import spark.implicits._
    val df = Seq(("a", "x  x y"), ("a", "z"), ("h", "p q r"))
      .toDF("grp", "text")
    val got = TextAnalysis.lexicalDiversity(df, "grp", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a") // x:2 y:1 z:1 -> N=4 V=3 V1=2 sum f^2 = 6
    assert(a.getAs[Long]("n_tokens") == 4L &&
      a.getAs[Long]("n_types") == 3L && a.getAs[Long]("n_hapax") == 2L)
    assert(a.getAs[Double]("ttr") == 0.75)
    assert(math.abs(a.getAs[Double]("hapax_ratio") - 2.0 / 3) < 1e-12)
    // K = 1e4 * (6 - 4) / 16 = 1250
    assert(a.getAs[Double]("yules_k") == 1250.0)
    // every type a hapax: sum f^2 = N -> K = 0
    assert(got("h").getAs[Double]("yules_k") == 0.0)
  }

  test("wilcoxonSignedRank: textbook no-tie and tied cases; zero " +
      "diffs drop") {
    import spark.implicits._
    // one obs per (key, condition); diffs 4, -2, 6 -> ranks of |d|:
    // 2, 1, 3 -> W+ = 5, z = 2 / sqrt(3.5)
    def ev(rows: Seq[(String, Boolean, Long)]) =
      rows.toDF("k", "c", "x")
    val r1 = Stats.wilcoxonSignedRank(
      ev(Seq(("k1", true, 5L), ("k1", false, 1L),
        ("k2", true, 1L), ("k2", false, 3L),
        ("k3", true, 6L), ("k3", false, 0L))),
      "k", col("c"), col("x")).collect()(0)
    assert(r1.getAs[Long]("n") == 3L)
    assert(r1.getAs[Double]("w_plus") == 5.0)
    assert(math.abs(r1.getAs[Double]("z") - 2.0 / math.sqrt(3.5)) < 1e-12)
    // diffs 3, -3, 5: tied |d| -> avg ranks 1.5, 1.5, 3; W+ = 4.5;
    // T = 2^3 - 2 = 6 -> var(2W+) = (168 - 6)/12 = 13.5
    val r2 = Stats.wilcoxonSignedRank(
      ev(Seq(("k1", true, 3L), ("k1", false, 0L),
        ("k2", true, 0L), ("k2", false, 3L),
        ("k3", true, 5L), ("k3", false, 0L))),
      "k", col("c"), col("x")).collect()(0)
    assert(r2.getAs[Double]("w_plus") == 4.5)
    assert(math.abs(r2.getAs[Double]("z") -
      6.0 / (2.0 * math.sqrt(13.5))) < 1e-12)
    // a zero-diff key drops from n entirely (standard Wilcoxon)
    val r3 = Stats.wilcoxonSignedRank(
      ev(Seq(("k1", true, 5L), ("k1", false, 1L),
        ("k0", true, 2L), ("k0", false, 2L))),
      "k", col("c"), col("x")).collect()(0)
    assert(r3.getAs[Long]("n") == 1L && r3.getAs[Double]("w_plus") == 1.0)
  }

  test("doubledRanks distributed prefix: multi-bucket cardinality " +
      "matches closed forms (wilcoxon) and brute force (spearman)") {
    import spark.implicits._
    // 2000 DISTINCT |d| values span every range bucket at the test's 8
    // shuffle partitions — exercises the two-level prefix (per-bucket
    // window + broadcast offsets), which tiny textbook cases cannot.
    // d_i = +i for odd i, −i for even i: |d| ranks are exactly i, so
    // W⁺ = Σ_{odd i≤1999} i = 1000² and z has a closed form (no ties).
    val n = 2000
    val rows = (1 to n).flatMap { i =>
      if (i % 2 == 1) Seq((s"k$i", true, i.toLong), (s"k$i", false, 0L))
      else Seq((s"k$i", true, 0L), (s"k$i", false, i.toLong))
    }
    val r = Stats.wilcoxonSignedRank(rows.toDF("k", "c", "x"),
      "k", col("c"), col("x")).collect()(0)
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Double]("w_plus") == 1000.0 * 1000.0)
    val mean = n.toDouble * (n + 1) / 4
    val sd = math.sqrt(n.toDouble * (n + 1) * (2 * n + 1) / 24)
    assert(math.abs(r.getAs[Double]("z") -
      (1000.0 * 1000.0 - mean) / sd) < 1e-9)
    // spearman over the same cardinality: distinct x and y (injective
    // multiplicative perm mod a prime), brute-force rho via sorted ranks
    val xs = (1 to n).map(_.toLong)
    val ys = xs.map(i => (i * 31L) % 2011L)
    val rankOf = (vs: Seq[Long]) =>
      vs.sorted.zipWithIndex.map { case (v, i) => v -> (i + 1) }.toMap
    val rx = rankOf(xs); val ry = rankOf(ys)
    val d2 = xs.zip(ys).map { case (x, y) =>
      val d = rx(x) - ry(y); d.toDouble * d }.sum
    val expRho = 1.0 - 6.0 * d2 / (n.toDouble * (n.toDouble * n - 1))
    val rs = Stats.spearman(xs.zip(ys).toDF("x", "y"),
      col("x"), col("y")).collect()(0)
    assert(math.abs(rs.getAs[Double]("rho") - expRho) < 1e-9)
  }

  test("jonckheereTerpstra distributed prefix: multi-bucket value " +
      "cardinality matches the closed form") {
    import spark.implicits._
    // 3000 DISTINCT interleaved values across 2 groups span every
    // range bucket at the test's 8 shuffle partitions — exercises the
    // grouped two-level prefix (per-(group, bucket) window + broadcast
    // offsets) that replaced the one-window-task-per-group cumulative.
    // Group a holds the odds 2i−1, group b the evens 2j: x_a < x_b ⟺
    // i ≤ j, so J = Σ_{j=1..m} j = m(m+1)/2 exactly, no ties anywhere.
    val m = 1500
    val rows = (1 to m).map(i => ("a", 2L * i - 1)) ++
      (1 to m).map(j => ("b", 2L * j))
    val r = Stats.jonckheereTerpstra(rows.toDF("g", "x"), "g", col("x"))
      .collect()(0)
    val n = 2.0 * m
    val jExp = m.toDouble * (m + 1) / 2
    val eExp = (n * n - 2.0 * m * m) / 4
    val varJ = (n * (n - 1) * (2 * n + 5) -
      2.0 * m * (m - 1) * (2 * m + 5)) / 72
    assert(r.getAs[Long]("n") == 2L * m && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("j_stat") == jExp)
    assert(r.getAs[Double]("e_j") == eExp)
    assert(math.abs(r.getAs[Double]("z") -
      (jExp - eExp) / math.sqrt(varJ)) < 1e-9)
  }

  test("theilsU: determination = 1, independence = 0, single-category " +
      "NULL, and the coefficient is asymmetric") {
    import spark.implicits._
    // each y maps to exactly one x -> knowing y removes all of H(X)
    val det = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L), ("c", 3L))
      .toDF("x", "y")
    val rd = Stats.theilsU(det, "x", "y").collect()(0)
    assert(math.abs(rd.getAs[Double]("u") - 1.0) < 1e-6, rd)
    // uniform independent 2x2: every lnq argument is exactly 1 -> mi 0
    val ind = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("x", "y")
    val ri = Stats.theilsU(ind, "x", "y").collect()(0)
    assert(ri.getAs[Double]("mi") == 0.0 && ri.getAs[Double]("u") == 0.0)
    // single X category: H(X) = 0 -> NULL u
    val one = Seq(("a", 1L), ("a", 2L)).toDF("x", "y")
    val ro = Stats.theilsU(one, "x", "y").collect()(0)
    assert(ro.isNullAt(ro.fieldIndex("u")), ro)
    // X determined by Y but not vice versa: U(X|Y) = 1, U(Y|X) < 1
    val asym = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("x", "y")
    val uxy = Stats.theilsU(asym, "x", "y").collect()(0).getAs[Double]("u")
    val uyx = Stats.theilsU(asym, "y", "x").collect()(0).getAs[Double]("u")
    assert(math.abs(uxy - 1.0) < 1e-6 && uyx < 0.99, s"$uxy / $uyx")
  }

  test("friedman: textbook perfect-consistency 6.0; Conover tie form; " +
      "incomplete blocks drop; constant values read NULL") {
    import spark.implicits._
    def df(rows: Seq[(String, String, Long)]) =
      rows.toDF("b", "t", "x")
    // 3 blocks, C > B > A everywhere: R = (3, 6, 9) -> chi2 = 6
    val perfect = df(Seq(
      ("b1", "A", 1L), ("b1", "B", 2L), ("b1", "C", 3L),
      ("b2", "A", 2L), ("b2", "B", 3L), ("b2", "C", 4L),
      ("b3", "A", 1L), ("b3", "B", 3L), ("b3", "C", 5L)))
    val rp = Stats.friedman(perfect, "b", "t", col("x")).collect()(0)
    assert(rp.getAs[Long]("n_blocks") == 3L && rp.getAs[Long]("k") == 3L)
    assert(math.abs(rp.getAs[Double]("chi2") - 6.0) < 1e-12, rp)
    // tie in block 1 (A = B): hand Conover: 2 * 13.5 / 5.5
    val tied = df(Seq(
      ("b1", "A", 1L), ("b1", "B", 1L), ("b1", "C", 2L),
      ("b2", "A", 1L), ("b2", "B", 2L), ("b2", "C", 3L),
      ("b3", "A", 2L), ("b3", "B", 1L), ("b3", "C", 3L)))
    val rt = Stats.friedman(tied, "b", "t", col("x")).collect()(0)
    assert(math.abs(rt.getAs[Double]("chi2") - 27.0 / 5.5) < 1e-12, rt)
    // a block missing treatment C is dropped entirely
    val incomplete = df(Seq(("b4", "A", 9L), ("b4", "B", 1L)))
    val ri = Stats.friedman(perfect.union(incomplete), "b", "t",
      col("x")).collect()(0)
    assert(ri.getAs[Long]("n_blocks") == 3L &&
      math.abs(ri.getAs[Double]("chi2") - 6.0) < 1e-12, ri)
    // all means equal within every block -> A = C -> NULL
    val const = df(Seq(
      ("b1", "A", 5L), ("b1", "B", 5L), ("b1", "C", 5L),
      ("b2", "A", 7L), ("b2", "B", 7L), ("b2", "C", 7L)))
    val rc = Stats.friedman(const, "b", "t", col("x")).collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("chi2")), rc)
  }

  test("avgNeighborDegree: star hand case — leaves see the hub, " +
      "the hub sees leaves") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = Components.avgNeighborDegree(star, "a", "b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(3L -> ((3L, 1.0)), 1L -> ((3L, 3.0))))
  }

  test("richClub: K4 + pendant — full density above the cutoff, " +
      "NULL below two members") {
    import spark.implicits._
    // K4 on 1-4 (deg 3; node 4 deg 4 via the pendant), pendant 4-5
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Components.richClub(e, "a", "b", Seq(0L, 2L, 3L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // k=0: all 5 nodes, 7 edges -> 14/20
    assert(got(0L) == ((5L, 7L, Some(0.7))))
    // k=2: nodes {1,2,3,4}, the 6 K4 edges -> 12/12 = 1.0
    assert(got(2L) == ((4L, 6L, Some(1.0))))
    // k=3: only node 4 qualifies -> NULL phi
    assert(got(3L) == ((1L, 0L, None)))
    // duplicated cutoffs dedupe: one row per distinct k, same counts
    // (a dup used to double-match through the crossJoin and inflate
    // n_nodes/n_edges/phi)
    val dup = Components.richClub(e, "a", "b", Seq(2L, 2L, 2L)).collect()
    assert(dup.length == 1)
    assert(dup(0).getLong(1) == 4L && dup(0).getLong(2) == 6L &&
      dup(0).getDouble(3) == 1.0)
  }

  test("cochranQ: textbook hand case; absent pairs count as failure; " +
      "no within-block variation → NULL") {
    import spark.implicits._
    // blocks b1(1,1,0) b2(1,0,0) b3(1,1,1) b4(0,0,0): T=6, ΣR²=14,
    // ΣC²=14 → Q = 2(3·14−36)/(3·6−14) = 12/4 = 3. b2's B/C and b4's
    // entire row are ABSENT (dense completion fills failures).
    val rows = Seq(("b1", "A", 60L), ("b1", "B", 60L), ("b1", "C", 10L),
      ("b2", "A", 60L), ("b3", "A", 60L), ("b3", "B", 60L),
      ("b3", "C", 60L), ("b4", "A", 10L))
    val r = Stats.cochranQ(rows.toDF("blk", "trt", "v"), "blk", "trt",
      col("v") > 50, Seq("A", "B", "C")).collect()(0)
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Long]("total_successes") == 6L)
    assert(r.getAs[Double]("q") == 3.0)
    // every block all-success → k·T − ΣR² = 0 → NULL
    val flat = Seq(("b1", "A", 60L), ("b1", "B", 60L),
      ("b2", "A", 60L), ("b2", "B", 60L))
    assert(Stats.cochranQ(flat.toDF("blk", "trt", "v"), "blk", "trt",
      col("v") > 50, Seq("A", "B")).collect()(0).isNullAt(3))
  }

  test("jonckheereTerpstra: perfect ascending trend hand case; " +
      "cross-group tie counts half") {
    import spark.implicits._
    // g1=[1,2] g2=[3,4] g3=[5,6]: J = 12 (max), E = (36−12)/4 = 6,
    // var (no ties) = (6·5·17 − 3·2·1·9)/72 = 456/72
    val rows = Seq(("g1", 1L), ("g1", 2L), ("g2", 3L), ("g2", 4L),
      ("g3", 5L), ("g3", 6L))
    val r = Stats.jonckheereTerpstra(rows.toDF("g", "x"), "g", col("x"))
      .collect()(0)
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("j_stat") == 12.0)
    assert(r.getAs[Double]("e_j") == 6.0)
    assert(math.abs(r.getAs[Double]("z") -
      6.0 / math.sqrt(456.0 / 72.0)) < 1e-12)
    // one value in each of two groups, tied: U = 1/2 → J = 0.5
    val tied = Seq(("g1", 7L), ("g2", 7L))
    val rt = Stats.jonckheereTerpstra(tied.toDF("g", "x"), "g", col("x"))
      .collect()(0)
    assert(rt.getAs[Double]("j_stat") == 0.5)
  }

  test("reciprocity: mutual pair + one-way edge; loops and dups drop") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (4L, 4L))
      .toDF("s", "t")
    val r = Components.reciprocity(e, "s", "t").collect()(0)
    assert(r.getAs[Long]("m_directed") == 3L)
    assert(r.getAs[Long]("m_reciprocal") == 2L)
    assert(math.abs(r.getAs[Double]("reciprocity") - 2.0 / 3) < 1e-12)
  }

  test("transitivity: triangle + pendant = 3/5; star graph reads 0") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val r = Components.transitivity(e, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Double]("transitivity") == 0.6)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val rs = Components.transitivity(star, "a", "b").collect()(0)
    assert(rs.getAs[Long]("n_triangles") == 0L &&
      rs.getAs[Double]("transitivity") == 0.0)
  }

  test("fleissKappa: exact 22/40 hand case; wrong-panel items drop; " +
      "single-category agreement is NULL (vacuous)") {
    import spark.implicits._
    // 3 raters: i1 AAA, i2 AAB, i3 BBB → P̄ = 7/9, Pe = 41/81,
    // κ = 22/40 = 0.55 exactly; i4 has only 2 ratings → dropped
    val rows = Seq(("i1", "A"), ("i1", "A"), ("i1", "A"),
      ("i2", "A"), ("i2", "A"), ("i2", "B"),
      ("i3", "B"), ("i3", "B"), ("i3", "B"),
      ("i4", "A"), ("i4", "B"))
    val r = graft.ops.Quality.fleissKappa(rows.toDF("item", "cat"),
      "item", "cat", nRaters = 3).collect()(0)
    assert(r.getAs[Long]("n_items") == 3L)
    assert(r.getAs[Double]("p_bar") == 7.0 / 9)
    assert(r.getAs[Double]("p_e") == 41.0 / 81)
    assert(math.abs(r.getAs[Double]("kappa") - 0.55) < 1e-12)
    // all raters one category on every item → Pe = 1 → NULL
    val one = Seq(("i1", "A"), ("i1", "A"), ("i2", "A"), ("i2", "A"))
    assert(graft.ops.Quality.fleissKappa(one.toDF("item", "cat"),
      "item", "cat", nRaters = 2).collect()(0).isNullAt(4))
  }

  test("modularity: two clean cliques ≈ 1/2; whole graph in one " +
      "community = 0; perfect anti-partition negative") {
    import spark.implicits._
    // two disjoint triangles, labels = the component → m=6, each
    // community: e_c=3, d_c=6 → Q = 2·(3/6 − (6/12)²) = 1/2
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val lab2 = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("n", "c")
    val r = Components.modularity(e, "a", "b", lab2, "n", "c")
      .collect()(0)
    assert(r.getAs[Long]("n_communities") == 2L &&
      r.getAs[Long]("m_edges") == 6L)
    assert(r.getAs[Double]("modularity") == 0.5)
    // everything in one community: e_c = m, d_c = 2m → Q = 0 exactly
    val lab1 = (1L to 6L).map(n => (n, 0L)).toDF("n", "c")
    assert(Components.modularity(e, "a", "b", lab1, "n", "c")
      .collect()(0).getAs[Double]("modularity") == 0.0)
    // bipartite-split labels on one triangle: no intra edges → Q < 0
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val labX = Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("n", "c")
    assert(Components.modularity(tri, "a", "b", labX, "n", "c")
      .collect()(0).getAs[Double]("modularity") < 0.0)
  }

  test("heapsLaw: exact two-probe hand case recovers the planted " +
      "exponent") {
    import spark.implicits._
    // docs 0 and 1 hold 2 tokens each; doc 0 has 1 type, docs 0-1
    // have 2 types → probes (T,V) = (2,1) and (4,2):
    // beta = ln2/ln2 = 1 on the grid (both axes quantize identically)
    val docs = Seq((0L, "a a"), (1L, "b a")).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.heapsLaw(docs, "doc_id", "text")
      .collect()(0)
    assert(r.getAs[Long]("n_probes") == 2L)
    assert(math.abs(r.getAs[Double]("beta") - 1.0) < 1e-6)
    // single informative probe → NULL beta
    val one = Seq((0L, "a b")).toDF("doc_id", "text")
    assert(graft.ops.TextAnalysis.heapsLaw(one, "doc_id", "text")
      .collect()(0).isNullAt(1))
  }

  test("pageTrend: perfect ascending blocks hit the max L; " +
      "incomplete blocks drop") {
    import spark.implicits._
    // 2 complete blocks, k=3, perfect order: each block ranks 1,2,3 →
    // L = 2·(1+4+9) = 28; E = b·k(k+1)²/4 = 24; classical
    // var = b·k²(k+1)²(k−1)/144 = 2·9·16·2/144 = 4 → z = 4/2 = 2
    val rows = Seq(("u1", "lo", 1L), ("u1", "mid", 2L), ("u1", "hi", 3L),
      ("u2", "lo", 10L), ("u2", "mid", 20L), ("u2", "hi", 30L),
      ("u3", "lo", 5L)) // u3 incomplete → dropped
    val r = Stats.pageTrend(rows.toDF("b", "t", "x"), "b", "t",
      col("x"), Seq("lo", "mid", "hi")).collect()(0)
    assert(r.getAs[Long]("n_blocks") == 2L && r.getAs[Int]("k") == 3)
    assert(r.getAs[Double]("l_stat") == 28.0)
    assert(math.abs(r.getAs[Double]("z") - (28.0 - 24.0) / 2.0) < 1e-12)
  }

  test("krippendorffAlpha: perfect agreement = 1, chance = 0; " +
      "single-rating units drop; variable panels mix exactly") {
    import spark.implicits._
    // u1: AA, u2: BB → A_o = 1, A_e = (2+2)/(4·3) = 1/3 → α = 1
    val perfect = Seq(("u1", "A"), ("u1", "A"), ("u2", "B"), ("u2", "B"))
    val rp = graft.ops.Quality.krippendorffAlpha(
      perfect.toDF("u", "cat"), "u", "cat").collect()(0)
    assert(rp.getAs[Long]("n_pairable") == 4L)
    assert(rp.getAs[Double]("alpha") == 1.0)
    // u1: AA, u2: AB → A_o = 1/2 = A_e → α = 0; u3 single rating drops
    val chance = Seq(("u1", "A"), ("u1", "A"), ("u2", "A"), ("u2", "B"),
      ("u3", "B"))
    val rc = graft.ops.Quality.krippendorffAlpha(
      chance.toDF("u", "cat"), "u", "cat").collect()(0)
    assert(rc.getAs[Long]("n_pairable") == 4L)
    assert(rc.getAs[Double]("alpha") == 0.0)
    // mixed panel sizes: u1 (m=3): AAB, u2 (m=2): AA →
    // ΣO_cc = (2·1)/2 + (0)/2 + 2/1 = 3; n = 5 → A_o = 3/5
    // margins A=4, B=1 → A_e = 12/20 = 3/5 → α = 0 exactly
    val mix = Seq(("u1", "A"), ("u1", "A"), ("u1", "B"),
      ("u2", "A"), ("u2", "A"))
    val rm = graft.ops.Quality.krippendorffAlpha(
      mix.toDF("u", "cat"), "u", "cat").collect()(0)
    assert(rm.getAs[Double]("s_o") == 0.6 && rm.getAs[Double]("s_e") == 0.6)
    assert(rm.getAs[Double]("alpha") == 0.0)
    // one category corpus-wide: A_e = 1 → NULL (vacuous)
    val one = Seq(("u1", "A"), ("u1", "A"))
    assert(graft.ops.Quality.krippendorffAlpha(
      one.toDF("u", "cat"), "u", "cat").collect()(0).isNullAt(3))
  }

  test("attributeAssortativity: perfect same-attr mixing = 1; " +
      "bipartite anti-mixing negative; uniform NULL") {
    import spark.implicits._
    // two same-attr cliques, no cross edges → every mirror edge
    // same-attr: r = (M·M − ΣA²)/(M² − ΣA²) with Eii = M → r = 1
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val lab = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("n", "attr")
    val r = Components.attributeAssortativity(e, "a", "b", lab, "n",
      "attr").collect()(0)
    assert(r.getAs[Long]("n_attrs") == 2L &&
      r.getAs[Long]("m_directed") == 12L)
    assert(r.getAs[Double]("r") == 1.0)
    // star with center attr 0, leaves attr 1: no same-attr edge →
    // M=6, Eii=0, margins A0=3 A1=3 → r = (0−18)/(36−18) = −1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val labS = Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("n", "attr")
    assert(Components.attributeAssortativity(star, "a", "b", labS,
      "n", "attr").collect()(0).getAs[Double]("r") == -1.0)
    // single attribute everywhere: denominator 0 → NULL
    val lab1 = (1L to 4L).map(n => (n, 7L)).toDF("n", "attr")
    assert(Components.attributeAssortativity(star, "a", "b", lab1,
      "n", "attr").collect()(0).isNullAt(2))
  }

  test("chao1Richness: textbook singleton/doubleton hand case") {
    import spark.implicits._
    // slice g: tokens a a b b c d e → V=5, F1=3 (c,d,e), F2=2 (a,b)
    // chao1 = 5 + 3·2/(2·3) = 6
    val docs = Seq(("g", "a a b b c"), ("g", "d e")).toDF("lang", "text")
    val r = graft.ops.TextAnalysis.chao1Richness(docs, "lang", "text")
      .collect()(0)
    assert(r.getAs[Long]("n_types") == 5L && r.getAs[Long]("f1") == 3L &&
      r.getAs[Long]("f2") == 2L)
    assert(r.getAs[Double]("chao1") == 6.0)
    // no doubletons: bias-corrected form stays defined
    val d2 = Seq(("h", "x y z")).toDF("lang", "text")
    val r2 = graft.ops.TextAnalysis.chao1Richness(d2, "lang", "text")
      .collect()(0)
    assert(r2.getAs[Double]("chao1") == 3.0 + 3.0 * 2 / 2.0)
  }

  test("hosmerLemeshow: two perfectly-sized bins hand case; " +
      "p=0 bins count as degenerate and contribute 0") {
    import spark.implicits._
    // bin0: 10 rows at score .25, 3 positive -> E=2.5, t=.25/1.875
    // bin1: 10 rows at score .75, 7 positive -> E=7.5, t=.25/1.875
    val rows = Seq.fill(3)((0.25, true)) ++ Seq.fill(7)((0.25, false)) ++
      Seq.fill(7)((0.75, true)) ++ Seq.fill(3)((0.75, false))
    val r = Stats.hosmerLemeshow(rows.toDF("s", "y"), col("s"),
      col("y"), bins = 2, lo = 0.0, hi = 1.0).collect()(0)
    assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("n_bins") == 2L)
    assert(r.getAs[Long]("n_degenerate") == 0L)
    assert(math.abs(r.getAs[Double]("chi2") - 4.0 / 15) < 1e-12, r)
    // at bins=4 the same rows split [.25 -> bin1, .75 -> bin3] and a
    // score-0.0 bin0 has no null variance -> degenerate, term 0; the
    // chi2 total is unchanged
    val withZero = rows ++ Seq.fill(5)((0.0, false))
    val r2 = Stats.hosmerLemeshow(withZero.toDF("s", "y"), col("s"),
      col("y"), bins = 4, lo = 0.0, hi = 1.0).collect()(0)
    assert(r2.getAs[Long]("n_bins") == 3L &&
      r2.getAs[Long]("n_degenerate") == 1L)
    assert(math.abs(r2.getAs[Double]("chi2") - 4.0 / 15) < 1e-12, r2)
  }

  test("mannWhitneyByKey: textbook no-tie and tied hand cases; " +
      "complete separation reads delta = -1; all-tied reads NULL z") {
    import spark.implicits._
    def df(rows: Seq[(String, Boolean, Long)]) =
      rows.toDF("k", "arm1", "x")
    // arm1 = {1,2} < arm2 = {3,4}: U1 = 0, delta = -1,
    // z = -2 / sqrt(20/12)
    val sep = df(Seq(("a", true, 1L), ("a", true, 2L),
      ("a", false, 3L), ("a", false, 4L)))
    val r1 = Stats.mannWhitneyByKey(sep, "k", col("arm1"), !col("arm1"),
      col("x")).collect()(0)
    assert(r1.getAs[Double]("u1") == 0.0)
    assert(r1.getAs[Double]("cliffs_delta") == -1.0)
    assert(math.abs(r1.getAs[Double]("z") -
      (-2.0 / math.sqrt(20.0 / 12))) < 1e-12, r1)
    // tie case: arm1 = {1,1}, arm2 = {1,3}: avg ranks 2,2,2,4 ->
    // U1 = 1, delta = -0.5, T = 24 -> varnum/144 = 1 -> z = -1
    val tied = df(Seq(("a", true, 1L), ("a", true, 1L),
      ("a", false, 1L), ("a", false, 3L)))
    val r2 = Stats.mannWhitneyByKey(tied, "k", col("arm1"), !col("arm1"),
      col("x")).collect()(0)
    assert(r2.getAs[Double]("u1") == 1.0)
    assert(r2.getAs[Double]("cliffs_delta") == -0.5)
    assert(math.abs(r2.getAs[Double]("z") - (-1.0)) < 1e-12, r2)
    // all values tied: varnum = 0 -> NULL z; delta = 0
    val allTied = df(Seq(("a", true, 5L), ("a", false, 5L),
      ("a", true, 5L), ("a", false, 5L)))
    val r3 = Stats.mannWhitneyByKey(allTied, "k", col("arm1"),
      !col("arm1"), col("x")).collect()(0)
    assert(r3.getAs[Double]("cliffs_delta") == 0.0 &&
      r3.isNullAt(r3.fieldIndex("z")), r3)
    // a key with an empty arm drops (the ksTest contract)
    val oneArm = df(Seq(("b", true, 1L), ("b", true, 2L)))
    assert(Stats.mannWhitneyByKey(sep.union(oneArm), "k", col("arm1"),
      !col("arm1"), col("x")).collect().map(_.getString(0)).toSeq
      == Seq("a"))
  }

  test("kendallW: identical rankings = 1, incomplete raters drop, " +
      "all-tied raters lower the tie-corrected denominator") {
    import spark.implicits._
    // 3 raters rank 3 objects identically -> W = 1
    val perfect = for (r <- 1 to 3; (o, v) <- Seq(("a", 1L), ("b", 2L),
      ("c", 3L))) yield (s"r$r", o, v)
    val rp = Stats.kendallW(perfect.toDF("rater", "obj", "x"),
      "rater", "obj", col("x")).collect()(0)
    assert(rp.getAs[Long]("n_raters") == 3L && rp.getAs[Int]("k") == 3)
    assert(rp.getAs[Double]("w") == 1.0)
    // a rater missing an object drops; the rest still agree -> W = 1
    val withPartial = perfect ++ Seq(("r4", "a", 9L), ("r4", "b", 1L))
    val rq = Stats.kendallW(withPartial.toDF("rater", "obj", "x"),
      "rater", "obj", col("x")).collect()(0)
    assert(rq.getAs[Long]("n_raters") == 3L && rq.getAs[Double]("w") == 1.0)
    // opposite rankings, b=2, k=3: R2_j = (2+6, 4+4, 6+2) = all 8 =
    // b(k+1) -> S2 = 0 -> W = 0
    val opp = Seq(("p", "a", 1L), ("p", "b", 2L), ("p", "c", 3L),
      ("q", "a", 3L), ("q", "b", 2L), ("q", "c", 1L))
    assert(Stats.kendallW(opp.toDF("rater", "obj", "x"),
      "rater", "obj", col("x")).collect()(0).getAs[Double]("w") == 0.0)
    // every rater all-ties: denominator b²k(k²−1) − b·Σ(t³−t) =
    // b²k(k²−1) − b²(k³−k) = 0 -> NULL
    val flat = for (r <- 1 to 2; o <- Seq("a", "b", "c"))
      yield (s"r$r", o, 5L)
    assert(Stats.kendallW(flat.toDF("rater", "obj", "x"),
      "rater", "obj", col("x")).collect()(0).isNullAt(2))
  }

  test("gammaSomersD: hand cases — perfect concordance, x-ties feed " +
      "d_xy but not gamma") {
    import spark.implicits._
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val rp = Stats.gammaSomersD(perfect, col("x"), col("y")).collect()(0)
    assert(rp.getAs[Long]("concordant") == 3L &&
      rp.getAs[Long]("discordant") == 0L)
    assert(rp.getAs[Double]("gamma") == 1.0 &&
      rp.getAs[Double]("d_yx") == 1.0 && rp.getAs[Double]("d_xy") == 1.0)
    // (1,1),(1,2),(2,3): C=2, D=0; n1x=2, n1y=0 ->
    // gamma=1, d_yx = 4/(6-2) = 1, d_xy = 4/6
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    val rt = Stats.gammaSomersD(tied, col("x"), col("y")).collect()(0)
    assert(rt.getAs[Long]("concordant") == 2L)
    assert(rt.getAs[Double]("gamma") == 1.0 &&
      rt.getAs[Double]("d_yx") == 1.0 &&
      math.abs(rt.getAs[Double]("d_xy") - 4.0 / 6.0) < 1e-15)
    // everything tied on both axes: gamma NULL (C+D = 0)
    val allT = Seq((1L, 1L), (1L, 1L)).toDF("x", "y")
    assert(Stats.gammaSomersD(allT, col("x"), col("y"))
      .collect()(0).isNullAt(3))
  }

  test("winsorizedMean: clamps the tails to the cut values; alpha=0 " +
      "is the plain mean") {
    import spark.implicits._
    // 1,2,3,4,100 at alpha=0.2 -> cut=1 -> 2,2,3,4,4 -> 3.0
    val d = Seq(1L, 2L, 3L, 4L, 100L).map(("g", _)).toDF("g", "x")
    val r = Stats.winsorizedMean(d, "g", col("x"), 0.2).collect()(0)
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("winsorized_mean") == 3.0)
    // alpha=0: nothing clamps
    assert(Stats.winsorizedMean(d, "g", col("x"), 0.0).collect()(0)
      .getAs[Double]("winsorized_mean") == 22.0)
    // ties across the cut: 1,1,1,9 at alpha=0.25 -> cut=1 -> clamp the
    // single bottom rank to the rank-2 value (1) and top rank to the
    // rank-3 value (1) -> 1,1,1,1 -> 1.0
    val t = Seq(1L, 1L, 1L, 9L).map(("g", _)).toDF("g", "x")
    assert(Stats.winsorizedMean(t, "g", col("x"), 0.25).collect()(0)
      .getAs[Double]("winsorized_mean") == 1.0)
  }

  test("jarqueBera: symmetric 3-point hand case; constant column NULL") {
    import spark.implicits._
    // {1,2,3}: skew 0, kurtosis m4/m2² = (2/3)/(4/9) = 1.5,
    // JB = 3·(0 + 2.25/24) = 0.28125
    val r = Stats.jarqueBera(Seq(1L, 2L, 3L).toDF("x"), col("x"))
      .collect()(0)
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("skewness") == 0.0)
    assert(r.getAs[Double]("kurtosis") == 1.5)
    assert(r.getAs[Double]("jb") == 3.0 * (1.5 * 1.5 / 24.0))
    // right-skewed {0,0,0,4}: m3 > 0 -> positive skewness
    assert(Stats.jarqueBera(Seq(0L, 0L, 0L, 4L).toDF("x"), col("x"))
      .collect()(0).getAs[Double]("skewness") > 0.0)
    // constant column: M2 = 0 -> NULLs
    val c = Stats.jarqueBera(Seq(7L, 7L, 7L).toDF("x"), col("x"))
      .collect()(0)
    assert(c.isNullAt(1) && c.isNullAt(2) && c.isNullAt(3))
  }

  test("durbinWatson: hand case + partition-stitch equals the " +
      "single-window brute force on a multi-partition series") {
    import spark.implicits._
    // 1,2,3,4: Σd² = 3, nΣx²−(Σx)² = 120−100 = 20 -> DW = 12/20 = 0.6
    val d = Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L), (4L, 1L, 4L))
      .toDF("ts", "id", "x")
    val r = Stats.durbinWatson(d, "ts", "id", col("x")).collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Double]("dw") == 0.6)
    // 2000 rows spanning every range partition: stitch == brute force
    val xs = (1 to 2000).map(i => (i.toLong, 1L, ((i * 37) % 101).toLong))
    val big = Stats.durbinWatson(xs.toDF("ts", "id", "x"), "ts", "id",
      col("x")).collect()(0)
    val vals = xs.map(_._3)
    val num = vals.sliding(2).map { case Seq(a, b) =>
      (b - a).toDouble * (b - a) }.sum
    val s1 = vals.sum.toDouble; val s2 = vals.map(v => v * v).sum.toDouble
    val exp = 2000.0 * num / (2000.0 * s2 - s1 * s1)
    assert(math.abs(big.getAs[Double]("dw") - exp) < 1e-9)
    // constant series: zero variance -> NULL
    assert(Stats.durbinWatson(Seq((1L, 1L, 5L), (2L, 1L, 5L))
      .toDF("ts", "id", "x"), "ts", "id", col("x"))
      .collect()(0).isNullAt(1))
  }

  test("ljungBox: equals the acf composition; short series NULL") {
    import spark.implicits._
    val rows = (1 to 40).map(i =>
      ("k", i.toLong, i.toLong, ((i * 13) % 7).toLong))
    val d = rows.toDF("k", "ts", "id", "x")
    val a = Stats.acf(d, "k", "ts", col("x"), 3, "id").collect()(0)
    val n = a.getAs[Long]("n").toDouble
    val exp = n * (n + 2.0) * (0.0 +
      a.getAs[Double]("r1") * a.getAs[Double]("r1") / (n - 1) +
      a.getAs[Double]("r2") * a.getAs[Double]("r2") / (n - 2) +
      a.getAs[Double]("r3") * a.getAs[Double]("r3") / (n - 3))
    val q = Stats.ljungBox(d, "k", "ts", col("x"), 3, "id").collect()(0)
    assert(q.getAs[Long]("n") == 40L && q.getAs[Int]("lags") == 3)
    assert(q.getAs[Double]("q") == exp)
    // n <= maxLag -> NULL
    val short = Seq(("k", 1L, 1L, 1L), ("k", 2L, 2L, 2L),
      ("k", 3L, 3L, 3L)).toDF("k", "ts", "id", "x")
    assert(Stats.ljungBox(short, "k", "ts", col("x"), 3, "id")
      .collect()(0).isNullAt(3))
  }

  test("linCcc: identity = 1, location bias < pearson, degenerate NULL") {
    import spark.implicits._
    val same = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(Stats.linCcc(same, col("x"), col("y")).collect()(0)
      .getAs[Double]("ccc") == 1.0)
    // y = x + 1: r = 1 but CCC = 12/21 (the location penalty)
    val shifted = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    assert(math.abs(Stats.linCcc(shifted, col("x"), col("y"))
      .collect()(0).getAs[Double]("ccc") - 12.0 / 21.0) < 1e-15)
    // both constant: denominator 0 -> NULL
    assert(Stats.linCcc(Seq((1L, 1L), (1L, 1L)).toDF("x", "y"),
      col("x"), col("y")).collect()(0).isNullAt(1))
  }

  test("moranGeary: path-graph hand cases — smooth gradient positive, " +
      "checkerboard negative, constant NULL") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    // x = node id: dev·4 = (−6,−2,2,6), den = 80, num = 40, W = 6 →
    // I = 160/480 = 1/3; Σd² = 6 → C = 288/960 = 0.3
    val lin = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("n", "x")
    val r = graft.ops.Components.moranGeary(path, "a", "b", lin, "n", "x")
      .collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4L &&
      r.getAs[Long]("m_directed") == 6L)
    assert(math.abs(r.getAs[Double]("moran_i") - 1.0 / 3.0) < 1e-15)
    assert(r.getAs[Double]("geary_c") == 0.3)
    // checkerboard 0,1,0,1: I = −1, C = 1.5
    val alt = Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L)).toDF("n", "x")
    val ra = graft.ops.Components.moranGeary(path, "a", "b", alt, "n", "x")
      .collect()(0)
    assert(ra.getAs[Double]("moran_i") == -1.0 &&
      ra.getAs[Double]("geary_c") == 1.5)
    // constant attribute: zero variance → NULLs
    val cst = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)).toDF("n", "x")
    val rc = graft.ops.Components.moranGeary(path, "a", "b", cst, "n", "x")
      .collect()(0)
    assert(rc.isNullAt(2) && rc.isNullAt(3))
  }

  test("icc1: perfect separation = 1 (balanced and unbalanced), " +
      "identical groups = -1, single group NULL") {
    import spark.implicits._
    val sep = Seq(("a", 1L), ("a", 1L), ("b", 5L), ("b", 5L))
      .toDF("t", "x")
    val rs = Stats.icc1(sep, "t", col("x")).collect()(0)
    assert(rs.getAs[Long]("n_targets") == 2L && rs.getAs[Long]("n") == 4L)
    assert(rs.getAs[Double]("icc1") == 1.0)
    // unbalanced panels, still zero within-variance: k0 = 1.5, ICC = 1
    val unb = Seq(("a", 1L), ("a", 1L), ("a", 1L), ("b", 5L))
      .toDF("t", "x")
    assert(Stats.icc1(unb, "t", col("x")).collect()(0)
      .getAs[Double]("icc1") == 1.0)
    // identical group distributions: SSB = 0 → ICC = −MSW/MSW = −1
    val same = Seq(("a", 1L), ("a", 5L), ("b", 1L), ("b", 5L))
      .toDF("t", "x")
    assert(Stats.icc1(same, "t", col("x")).collect()(0)
      .getAs[Double]("icc1") == -1.0)
    // one group: G < 2 → NULL
    assert(Stats.icc1(Seq(("a", 1L), ("a", 2L)).toDF("t", "x"), "t",
      col("x")).collect()(0).isNullAt(2))
  }

  test("pacf3: equals the Durbin-Levinson composition of acf; " +
      "degenerate variance NULLs") {
    import spark.implicits._
    val rows = (1 to 60).map(i =>
      ("k", i.toLong, i.toLong, ((i * 17 + i * i * 3) % 11).toLong))
    val d = rows.toDF("k", "ts", "id", "x")
    val a = Stats.acf(d, "k", "ts", col("x"), 3, "id").collect()(0)
    val (r1, r2, r3) = (a.getAs[Double]("r1"), a.getAs[Double]("r2"),
      a.getAs[Double]("r3"))
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 * (1.0 - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) /
      (1.0 - p21 * r1 - p22 * r2)
    val p = Stats.pacf3(d, "k", "ts", col("x"), "id").collect()(0)
    assert(p.getAs[Double]("pacf1") == r1)
    assert(p.getAs[Double]("pacf2") == p22)
    assert(p.getAs[Double]("pacf3") == p33)
    // constant series: acf NULL at every lag → pacf NULL
    val c = Stats.pacf3(Seq(("k", 1L, 1L, 5L), ("k", 2L, 2L, 5L),
      ("k", 3L, 3L, 5L), ("k", 4L, 4L, 5L), ("k", 5L, 5L, 5L))
      .toDF("k", "ts", "id", "x"), "k", "ts", col("x"), "id")
      .collect()(0)
    assert(c.isNullAt(2) && c.isNullAt(3) && c.isNullAt(4))
  }

  test("rmst: hand-computed KM areas — full horizon, early horizon, " +
      "censoring extends the last rectangle") {
    import spark.implicits._
    // events at t=10 (S→0.5) and t=20 (S→0):
    // RMST(30) = 10 + 0.5·10 + 0·10 = 15; RMST(15) = 10 + 0.5·5 = 12.5
    val both = Seq((10L, true), (20L, true)).toDF("dur", "obs")
    assert(Survival.rmst(both, "dur", "obs", Seq.empty, 30.0)
      .collect()(0).getAs[Double]("rmst") == 15.0)
    assert(Survival.rmst(both, "dur", "obs", Seq.empty, 15.0)
      .collect()(0).getAs[Double]("rmst") == 12.5)
    // second subject censored: S stays 0.5 after t=10 →
    // RMST(30) = 10 + 0.5·20 = 20
    val cens = Seq((10L, true), (20L, false)).toDF("dur", "obs")
    assert(Survival.rmst(cens, "dur", "obs", Seq.empty, 30.0)
      .collect()(0).getAs[Double]("rmst") == 20.0)
    // horizon before the first event: the whole area is the head
    assert(Survival.rmst(both, "dur", "obs", Seq.empty, 5.0)
      .collect()(0).getAs[Double]("rmst") == 5.0)
  }

  test("brierScore: dyadic-lattice hand cases; degenerate labels " +
      "NULL the skill") {
    import spark.implicits._
    // (0.75, true), (0.25, false) at grid 4 (lattice-exact):
    // brier = (0.0625 + 0.0625)/2; base = 0.25 → skill = 0.75
    val d = Seq((0.75, true), (0.25, false)).toDF("p", "y")
    val r = Stats.brierScore(d, col("p"), col("y"), grid = 4)
      .collect()(0)
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("n_cells") == 2L)
    assert(r.getAs[Double]("brier") == 0.0625)
    assert(r.getAs[Double]("brier_skill") == 0.75)
    // perfect 0/1 predictions: brier 0, skill 1
    val perfect = Seq((1.0, true), (0.0, false)).toDF("p", "y")
    val rp = Stats.brierScore(perfect, col("p"), col("y"), grid = 4)
      .collect()(0)
    assert(rp.getAs[Double]("brier") == 0.0 &&
      rp.getAs[Double]("brier_skill") == 1.0)
    // one-class labels: the base rate is degenerate → NULL skill
    val onec = Seq((0.5, true), (0.9, true)).toDF("p", "y")
    val ro = Stats.brierScore(onec, col("p"), col("y"), grid = 4)
      .collect()(0)
    assert(!ro.isNullAt(2) && ro.isNullAt(3))
    // non-power-of-two grid rejected (lattice exactness contract)
    intercept[IllegalArgumentException] {
      Stats.brierScore(d, col("p"), col("y"), grid = 1000)
    }
  }

  test("rakeKeywords: hand-computed deg/freq scores; overlong " +
      "candidates drop") {
    import spark.implicits._
    // "good data pipeline" + "good data": freq(good)=2 deg(good)=5,
    // freq(data)=2 deg(data)=5, freq(pipeline)=1 deg=3 →
    // scores 2.5+2.5+3 = 8 and 2.5+2.5 = 5
    val docs = Seq("good data pipeline the good data").toDF("text")
    val r = graft.ops.TextAnalysis.rakeKeywords(docs, "text",
        stopwords = Seq("the"))
      .collect().map(x => (x.getString(0), x.getLong(1),
        x.getDouble(2))).toSeq
    assert(r == Seq(("good data pipeline", 1L, 8.0),
      ("good data", 1L, 5.0)))
    // a candidate longer than maxPhraseLen contributes nothing
    val long = Seq("w1 w2 w3 w4 w5").toDF("text")
    assert(graft.ops.TextAnalysis.rakeKeywords(long, "text",
      stopwords = Seq("the"), maxPhraseLen = 4).count() == 0L)
    // repeated phrase: n_occ counts occurrences, score unchanged
    val rep = Seq("x y the x y").toDF("text")
    val rr = graft.ops.TextAnalysis.rakeKeywords(rep, "text",
      stopwords = Seq("the")).collect()(0)
    assert(rr.getString(0) == "x y" && rr.getLong(1) == 2L &&
      rr.getDouble(2) == 4.0)
  }

  test("adamicAdar: triangle+tail hand case; the hub guard drops " +
      "high-degree centers") {
    import spark.implicits._
    def lnq(x: Double) =
      math.floor(math.log(x) * 67108864.0) / 67108864.0
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = graft.ops.Components.adamicAdar(e, "a", "b")
      .collect().map(x => ((x.getLong(0), x.getLong(1)),
        (x.getAs[Long]("common_neighbors"), x.getAs[Double]("aa_score"),
          x.getAs[Boolean]("linked")))).toMap
    // deg: 1->2, 2->2, 3->3, 4->1
    assert(r((2L, 3L)) == ((1L, 1.0 / lnq(2.0), true)))  // via 1
    assert(r((1L, 3L)) == ((1L, 1.0 / lnq(2.0), true)))  // via 2
    assert(r((1L, 2L)) == ((1L, 1.0 / lnq(3.0), true)))  // via 3
    assert(r((1L, 4L)) == ((1L, 1.0 / lnq(3.0), false))) // via 3
    assert(r((2L, 4L)) == ((1L, 1.0 / lnq(3.0), false))) // via 3
    assert(r.size == 5)
    // maxDegree = 2 drops center 3: only the wedges through 1 and 2
    val g = graft.ops.Components.adamicAdar(e, "a", "b", maxDegree = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(g == Set((2L, 3L), (1L, 3L)))
  }
}
