package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract).
  *
  * Runs every corpus query against `SPARK_GRAFT_SF_DIR` (default sf0.1) on
  * local[32], shuffle.partitions=32, AQE on — the closest local analogue of
  * the multi-executor target. Each query is fully evaluated through the
  * noop sink (count() would let Catalyst skip projection work).
  *
  * Artifact protocol (VERDICT r9 item 4): the driver's stdout capture keeps
  * only the last ~2000 characters, so the 300+-entry per-query map (~8 KB)
  * printed as one line was ALWAYS truncated and `BENCH_r{N}.json` parsed to
  * null. The FULL per-query map therefore goes only to the artifact file
  * (`SPARK_GRAFT_BENCH_OUT`, default `BENCH_local_last.json` in the cwd);
  * stdout gets ONE final COMPACT JSON line (< 1.5 KB) with the totals and a
  * fixed HEADLINE query subset. Headline queries are timed twice and report
  * the min, so a throttled scheduler segment (the q156–q158 wobble of r9)
  * cannot masquerade as a per-operator regression; the one-pass total stays
  * the cross-round comparable in "value".
  *
  * TIMEOUT-PROOF FLUSH (VERDICT r14 item 2): BENCH_r14 was rc 124 /
  * parsed:null because the artifact was written only AFTER the full corpus
  * loop — a harness kill left ZERO information. The artifact file is now
  * REWRITTEN after every query and every canary probe (~10 KB, the rewrite
  * is free next to any query), with `"partial":true` until the run
  * completes; a killed run still leaves the per-query map and both canary
  * series up to the kill point. The final write sets `"partial":false` and
  * adds the headline min-of-2 map.
  *
  * THROTTLE DISCRIMINATION — two probes, two throttle classes:
  *  - `canary_series` (q01, a 1-task trivial scan, re-timed before the
  *    run, every 25 corpus queries, and after the last one — VERDICT r13
  *    item 1): detects BLOCK THROTTLE (everything slow, q01 included;
  *    calm floor ~0.21 s).
  *  - `canary_wide_series` (VERDICT r14 item 3): a fixed all-slots probe —
  *    `spark.range` summed across 32 partitions — interleaved with every
  *    q01 probe. SLOT STARVATION (r14's dominant class) leaves the 1-task
  *    q01 at-or-below calm (single-thread boost) while every 32-slot query
  *    inflates uniformly 1.3–2.5×; the wide probe inflates WITH them, so
  *    both classes are discriminable from the artifact file alone:
  *    q01 high → block throttle; q01 calm + wide high → slot starvation;
  *    both calm → calm window, bindable.
  * Canary probes are EXCLUDED from "value" (the one-pass total stays
  * cross-round comparable).
  * `SPARK_GRAFT_ONLY=q78,q79` restricts the run for local iteration.
  */
object Bench {

  /** Fixed headline set: the flagship relational shapes plus the heaviest
    * operator families (graph, dedup, ANN, stats) — stable across rounds so
    * the judge can diff BENCH_r{N}.json against BASELINE.md line by line.
    * Includes the full ATTRIBUTED HEAVY TAIL (q79 xxhash shingle chain —
    * the most CPU-bound query, measured 10× segment inflation vs 5.8 s
    * isolated in r11; q119 driver-local quantizer training, q146 n-gram
    * DF induction, q179 iterative k-core, q192 basket self-join, q216
    * bootstrap replication, q236 pair volume) so a throttle segment
    * landing on any of them self-discriminates from a regression via
    * min-of-2 (VERDICT r10 item 4). r12 (VERDICT r11 item 2): the
    * adjacent-block inflation class — q137/q140/q141/q142 around the
    * r11 q140 5.8 s / q141 6.3 s readings (~1.6/1.1 s typical, zero
    * code change) — plus q207 (the other per-key-quadratic stat) are
    * now headline too, so the artifact itself can prove a throttle
    * segment for that block instead of leaving it driver-opaque. */
  private val headline = Seq(
    "q01_count", "q11_star_join", "q18_range_join", "q21_pricing_summary",
    "q31_ranking", "q57_regional_revenue", "q61_ngram_jaccard",
    "q62_cosine_topk", "q71_minhash_neardup", "q76_ivf_topk",
    "q79_corpus_prep_report", "q119_ivfpq_topk", "q128_line_dedup",
    "q137_canonical_select", "q140_bit_bool_aggs", "q141_recursive_cte",
    "q142_curation_pipeline", "q146_boilerplate_spans",
    "q179_kcore", "q192_market_basket", "q207_theil_sen",
    "q216_bootstrap_ci", "q218_hits",
    "q236_item_neighbors", "q243_trimmed_mean", "q258_bfs_distances",
    "q264_decompose", "q273_cronbach",
    // r15 additions (additive — old headline diffs stay valid):
    // q300 carries the round's accepted distributed-prefix cost;
    // q317's wedge join is the heaviest new query
    "q300_jonckheere", "q317_adamic_adar")

  /** Rows for the wide canary: 32 even range partitions summed — sized so
    * a calm 32-slot box reads ~0.3–0.5 s (big enough that scheduler noise
    * is small relative to the reading, small enough that ~16 probes cost
    * under ~8 s per run). No shuffle: the probe measures SLOT
    * availability, and 32 independent map tasks are exactly that. */
  private val wideRows = 1200000000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = EtlSession.create(s"local[$cpus]", cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (codegen, parquet footers) so per-query times
    // reflect execution, not first-job JVM warmup.
    Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    val corpus = only match {
      case Some(names) => SparkEntry.corpus.filter(q =>
        names.exists(n => q.name == n || q.name.startsWith(n + "_")))
      case None => SparkEntry.corpus
    }
    def time(q: graft.queries.Q): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { q.fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Interleaved canary probes (see the scaladoc's throttle table): q01
    // from the FULL corpus (independent of any SPARK_GRAFT_ONLY filter)
    // plus the all-slots wide probe, re-timed before the run, every
    // `canaryEvery` queries, and after the last one — brackets every
    // ~25-query segment with BOTH throttle-class readings.
    val canaryEvery = 25
    val canaryQ = SparkEntry.corpus.find(_.name.startsWith("q01"))
    val canarySeries = scala.collection.mutable.ArrayBuffer[Double]()
    val canaryWideSeries = scala.collection.mutable.ArrayBuffer[Double]()
    val results = scala.collection.mutable.ArrayBuffer[(String, Double, Boolean)]()
    val headlineMin = scala.collection.mutable.ArrayBuffer[(String, Double)]()

    def jmap(kv: Seq[(String, Double)]) = kv
      .map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local_last.json")

    // The current state rendered as the FULL artifact JSON. `partial`
    // stays true until the run (including the headline second pass)
    // completes; a mid-run kill leaves everything timed so far.
    def commonJson(): String = {
      val qs = results
      val total = qs.map(_._2).sum
      val canary = qs.collectFirst { case (k, v, _) if k.startsWith("q01") => v }
      val onlyField = only
        .map(_.toSeq.sorted.map(n => s""""$n"""").mkString("[", ",", "]"))
        .getOrElse("null")
      val seriesJson = canarySeries
        .map("%.3f".format(_)).mkString("[", ",", "]")
      val wideJson = canaryWideSeries
        .map("%.3f".format(_)).mkString("[", ",", "]")
      s""""metric":"total","value":${"%.3f".format(total)},"unit":"sec"""" +
        s""","canary_q01_sec":${canary.map("%.3f".format(_)).getOrElse("null")}""" +
        s""","canary_series":$seriesJson,"canary_every":$canaryEvery""" +
        s""","canary_wide_series":$wideJson,"canary_wide_rows":$wideRows""" +
        s""","n_queries":${qs.size},"only":$onlyField"""
    }
    def flushArtifact(partial: Boolean): Unit = {
      val qs = jmap(results.toSeq.map { case (k, v, _) => (k, v) })
      val failed = results.collect { case (k, _, false) => s""""$k"""" }
        .mkString("[", ",", "]")
      val fullLine = s"""{${commonJson()},"partial":$partial,""" +
        s""""queries":$qs,"headline_min":${jmap(headlineMin.toSeq)},""" +
        s""""failed":$failed,"sf":"$sfDir"}"""
      // r16 (ADVICE r15): write-to-temp + ATOMIC_MOVE so a harness kill
      // landing mid-write can never leave a truncated artifact — the
      // exact failure mode the per-query flush exists to eliminate.
      try {
        val target = java.nio.file.Paths.get(out)
        val tmp = java.nio.file.Paths.get(out + ".tmp")
        java.nio.file.Files.write(tmp, (fullLine + "\n").getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case e: Exception =>
        System.err.println(s"[bench] artifact write to $out failed: ${e.getMessage}")
      }
    }
    def probeCanary(): Unit = {
      canaryQ.foreach { q =>
        val (s, ok) = time(q); if (ok) canarySeries += s
      }
      // all-slots probe: 32 parallel range-sum tasks, no shuffle
      val t0 = System.nanoTime()
      spark.range(0L, wideRows, 1L, cpus.toInt)
        .agg(org.apache.spark.sql.functions.sum("id")).collect()
      canaryWideSeries += (System.nanoTime() - t0) / 1e9
      flushArtifact(partial = true)
    }

    probeCanary()
    corpus.zipWithIndex.foreach { case (q, i) =>
      if (i > 0 && i % canaryEvery == 0) probeCanary()
      val (sec, ok) = time(q)
      results += ((q.name, sec, ok))
      flushArtifact(partial = true)
    }
    probeCanary()
    // Second timing pass for the headline subset only (bounded extra cost);
    // min-of-2 de-noises throttle segments without doubling the full run.
    // r16 (VERDICT r15 #3): the second pass is canary-BRACKETED — a probe
    // every 5 headline re-timings — so a storm arriving during this pass
    // (r15's q179 98.96 s reading) is visible from the artifact alone;
    // probes now span the full artifact timeline.
    corpus
      .filter(q => headline.contains(q.name))
      .zipWithIndex
      .foreach { case (q, hi) =>
        if (hi > 0 && hi % 5 == 0) probeCanary()
        val first = results.collectFirst { case (n, s, true) if n == q.name => s }
        first.foreach { f =>
          // a FAILED rerun must not publish its (fast) wall time as a
          // phantom speedup — fall back to the successful first pass
          val (t2, ok2) = time(q)
          headlineMin += ((q.name, if (ok2) math.min(f, t2) else f))
          flushArtifact(partial = true)
        }
      }
    probeCanary()
    flushArtifact(partial = false)
    // r17 (VERDICT r16 item 1): the stdout line outgrew the driver's
    // ~2000-char tail window — the ever-growing canary SERIES plus TWO
    // 30-entry maps pushed it past 1.9 KB and BENCH_r15/r16 both parsed
    // to null. The compact line now carries canary SUMMARY STATS
    // (min/med/max/n — enough to prove or rule out a throttle segment)
    // and the headline map ONCE, under the contract key "queries"
    // (identical to the artifact's headline_min by construction; the
    // full series and one-pass map live only in the artifact file).
    def stats(xs: Seq[Double]): String =
      if (xs.isEmpty) """{"n":0}"""
      else {
        val s = xs.sorted
        s"""{"min":${"%.3f".format(s.head)},"med":${"%.3f".format(
          s(s.size / 2))},"max":${"%.3f".format(s.last)},"n":${s.size}}"""
      }
    val compact =
      s""""metric":"total","value":${"%.3f".format(results.map(_._2).sum)}""" +
      s""","unit":"sec","n_queries":${results.size}""" +
      s""","n_failed":${results.count(!_._3)}""" +
      s""","canary_q01":${stats(canarySeries.toSeq)}""" +
      s""","canary_wide":${stats(canaryWideSeries.toSeq)}""" +
      s""","queries":${jmap(headlineMin.toSeq)}""" +
      s""","full_artifact":"$out","sf":"$sfDir""""
    // LAST line on stdout, sized (~1.1 KB) to survive the driver's
    // ~2000-char tail window with room for sbt's trailing output.
    println(s"{$compact}")
    spark.stop()
  }
}
