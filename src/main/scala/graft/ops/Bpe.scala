package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeSegment, BpeSegmentKernel}

/** Byte-pair-encoding tokenizer induction (Sennrich et al. 2016,
  * arXiv:1508.07909) — training the tokenizer IS a data-pipeline job,
  * and it is the canonical example of the bounded-driver-training
  * pattern this engine uses everywhere (IVF/PQ quantizers, DSIR
  * hashing): the corpus-sized work is ONE pass building the
  * (word, freq) table; the iterative merge learning then runs on that
  * vocabulary-sized table, capped at `maxWords` rows (frequency-ranked,
  * deterministic tie-break), on the driver — zero per-iteration cluster
  * jobs, exactly how production BPE trainers work (they train on word
  * counts, never on raw text).
  *
  * Applying the learned vocabulary back to the corpus is a map-only
  * projection through the [[graft.functions.BpeSegment]] kernel (merge
  * ranks attached as a JVM reference object, generated code calls the
  * static kernel — no Scala UDF, no shuffle).
  */
object Bpe {

  /** One corpus pass: lower-cased whitespace word frequencies. */
  def wordFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` merges from the corpus: one scan for the word
    * table, driver-local training on its top `maxWords` rows (by freq
    * desc, then word — deterministic at any corpus size). */
  def train(docs: DataFrame, idCol: String, textCol: String,
            numMerges: Int, maxWords: Int = 50000): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val wf = wordFreqs(docs, idCol, textCol)
      .orderBy(desc("freq"), col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainOnCounts(wf.toSeq, numMerges)
  }

  /** Classic BPE merge learning over a word-frequency table. Fully
    * deterministic: the best pair maximizes count, ties break to the
    * lexicographically smallest (left, right). Stops early when no
    * adjacent pair remains. */
  def trainOnCounts(wf: Seq[(String, Long)],
                    numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wf.map { case (w, f) =>
      (w.map(_.toString).toArray :+ BpeSegmentKernel.EndOfWord, f)
    }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts.update(p, counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, f) => (applyMerge(syms, best), f) }
      }
    }
    merges.toSeq
  }

  /** One left-to-right merge pass (the training-side application). */
  private[graft] def applyMerge(syms: Array[String],
                                m: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The persistable merge table: (rank, left, right). */
  def mergesTable(merges: Seq[(String, String)],
                  spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
  }

  /** Reload merges persisted via [[mergesTable]]. */
  def mergesFromTable(table: DataFrame): Seq[(String, String)] =
    table.select("rank", "left", "right").collect()
      .map(r => (r.getAs[Number]("rank").intValue(),
        r.getString(1), r.getString(2)))
      .sortBy(_._1).map(t => (t._2, t._3)).toSeq

  /** The segmentation column: `bpe_segment(wordCol, merges)` through
    * the session function registry (the pq_encode route — the foldable
    * merge literal materializes into the kernel's JVM rank map at
    * analysis time; [[graft.functions.Registry.registerAll]] must have
    * run on the session). */
  def segmentCol(wordCol: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_segment", wordCol,
      typedLit(merges.map(m => Seq(m._1, m._2))))

  /** Corpus token frequencies under a learned vocabulary. Words repeat
    * massively, so the kernel segments each DISTINCT word once on the
    * vocabulary-sized frequency table and the per-token counts are
    * frequency-weighted sums — the per-occurrence formulation would run
    * the segmentation loop corpus-many times for identical results.
    * (Per-doc tokenization, when needed, is the map-only
    * [[segmentCol]] projection over the exploded corpus.) */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    graft.functions.Registry.registerAll(docs.sparkSession)
    wordFreqs(docs, idCol, textCol)
      .select(explode(segmentCol(col("word"), merges)).as("token"),
        col("freq"))
      .groupBy("token").agg(sum("freq").as("n"))
  }
}
