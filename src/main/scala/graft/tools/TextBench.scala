package graft.tools

import org.apache.spark.sql.functions._

import graft.EtlSession
import graft.ops.{Indexing, TextAnalysis, Vocab}

/** Text-curation tier at volume — the LLM-data-pipeline stages priced
  * beyond the 600-doc fixture: 1M synthetic documents (~60 tokens each,
  * hub-mixture vocabulary over 50k types + injected stopwords and
  * sentence-final punctuation so every rule has signal), parquet-backed
  * (the MergeBench discipline), min-of-2 per op on this throttled box.
  * The tier's scale claims are shape claims — quality/langid/gopher/C4
  * are pure projections that must price at ~scan speed; vocab induction
  * is one grouped count + a top-K; OOV is a broadcast membership join;
  * BM25 is term-filtered posting lists — and this tool is what makes
  * them measured claims. Prints ONE JSON line.
  *
  *   java -cp ... graft.tools.TextBench     # TEXT_DOCS=1000000 default
  */
object TextBench {

  private def h(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b * 0xD1B54A32D192ED03L +
      0x8CB92BA72F3D8DD7L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** min-of-2: the second run is steady-state (page cache + JIT); a
    * throttle segment then cannot masquerade as an op cost. */
  private def time2(body: => Long): (Long, Double) = {
    def once = { val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9) }
    val (r, t1) = once; val (_, t2) = once
    (r, math.min(t1, t2))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("TEXT_DOCS", "1000000").toLong
    val spark = EtlSession.create("local[32]", 32, "graft-text-bench")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val stop = Array("the", "and", "of", "to", "in")
    val docs0 = spark.range(nDocs).map { i =>
      val sb = new StringBuilder(512)
      var j = 0L
      while (j < 60) {
        if (j % 20 == 19) sb.append(". ") // 3 sentences/lines worth
        val r = h(i * 64 + j, 17L)
        if (j % 8 == 3) sb.append(stop(java.lang.Math.floorMod(r, 5L).toInt))
        else {
          // hub mixture: 80% uniform over 50k types, 20% over 200 hot
          val wid = if (java.lang.Math.floorMod(r, 5L) == 0L)
            java.lang.Math.floorMod(h(r, 19L), 200L)
          else java.lang.Math.floorMod(h(r, 23L), 50000L)
          sb.append("w").append(wid)
        }
        sb.append(' ')
        j += 1
      }
      sb.append("end.")
      (i, sb.toString)
    }.toDF("doc_id", "text")
    val base = "/tmp/graft_textbench"
    docs0.repartition(32).write.mode("overwrite")
      .parquet(s"$base/docs.parquet")
    def docs = spark.read.parquet(s"$base/docs.parquet")

    val (qRows, qSec) = time2 {
      TextAnalysis.qualityScore(docs, "doc_id", "text").count()
    }
    val (lRows, lSec) = time2 {
      TextAnalysis.languageId(docs, "doc_id", "text")
        .filter(col("lang_guess").isNotNull).count()
    }
    val (gRows, gSec) = time2 {
      TextAnalysis.gopherRules(docs, "doc_id", "text")
        .filter(col("keep")).count()
    }
    val (cRows, cSec) = time2 {
      TextAnalysis.c4Filters(docs, "doc_id", "text")
        .filter(col("keep")).count()
    }
    val (vRows, vSec) = time2 {
      Vocab.induceVocab(docs, "text", 10000).count()
    }
    val vocab = Vocab.induceVocab(docs, "text", 10000)
      .localCheckpoint(false)
    val (oRows, oSec) = time2 {
      Vocab.oovRate(docs, "doc_id", "text", vocab).count()
    }
    val (bRows, bSec) = time2 {
      Indexing.bm25(docs, "doc_id", "text",
        Seq("w1", "w42", "w7", "w100", "w3")).count()
    }
    val (tRows, tSec) = time2 {
      TextAnalysis.tokenCounts(docs, "doc_id", "text").count()
    }
    // the floor every projection-shaped stage is judged against
    val (sRows, sSec) = time2 { docs.count() }

    println(s"""{"bench":"text","docs":$nDocs,""" +
      s""""scan_sec":${f"$sSec%.2f"},"scan_rows":$sRows,""" +
      s""""quality_sec":${f"$qSec%.2f"},"quality_rows":$qRows,""" +
      s""""langid_sec":${f"$lSec%.2f"},"langid_rows":$lRows,""" +
      s""""gopher_sec":${f"$gSec%.2f"},"gopher_pass":$gRows,""" +
      s""""c4_sec":${f"$cSec%.2f"},"c4_kept":$cRows,""" +
      s""""vocab_sec":${f"$vSec%.2f"},"vocab_rows":$vRows,""" +
      s""""oov_sec":${f"$oSec%.2f"},"oov_rows":$oRows,""" +
      s""""bm25_sec":${f"$bSec%.2f"},"bm25_rows":$bRows,""" +
      s""""tokencounts_sec":${f"$tSec%.2f"},"tokencounts_rows":$tRows}""")
    spark.stop()
  }
}
