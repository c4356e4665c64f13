package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary induction and out-of-vocabulary gating (SURVEY.md §2.8c
  * L4 family): learn the corpus's top-K token vocabulary, score every
  * document by the share of its tokens that fall outside it, and gate
  * on that share. The standard "prune to a closed vocabulary" step of
  * a training-data pipeline — a high OOV rate flags boilerplate,
  * non-text, wrong-language, or encoding-mangled documents that the
  * per-document quality rules miss because they only see one row.
  *
  * Scale shape: induction is one exploded grouped count with map-side
  * partials, then a distributed top-K (`orderBy.limit` →
  * TakeOrderedAndProject: per-partition heaps of K, driver merge of
  * K·partitions rows — never a global single-partition sort); the
  * vocabulary is K rows and broadcasts. Scoring is explode →
  * broadcast hash join (no shuffle of the corpus by token) → one
  * per-document aggregation. Tokenization is the whitespace split the
  * rest of the corpus contract uses, so an independent engine
  * reproduces it exactly.
  */
object Vocab {

  /** Top-K vocabulary by corpus frequency. Ties at the cut rank break
    * to the lexicographically smaller token — (freq DESC, token ASC)
    * is a total order, so the induced set is deterministic and an
    * independent engine derives the identical vocabulary. Returns
    * (token, freq) with freq non-increasing. */
  def induceVocab(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topK)
  }

  /** Per-document OOV stats against a supplied vocabulary:
    * (id, n_tokens, oov_tokens, oov_rate). The rate is ONE double
    * division of two exact integer counts (rounded to 6 dp), so it is
    * bit-reproducible across engines — no float accumulation.
    * Zero-token documents are kept with rate 0.0 (they have no
    * out-of-vocabulary evidence; gate them on emptiness elsewhere —
    * gopherRules/c4Filters own that call): `explode_outer` over the
    * pre-filtered token array emits one null-token row for them, so
    * ONE corpus scan covers every document — no join-back pass (the
    * earlier formulation re-scanned the corpus just to resurrect the
    * empty docs). `carryCols` ride the explode so a caller grouping
    * the rates by e.g. language needs no third scan either. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame, carryCols: Seq[String] = Nil): DataFrame = {
    val toks = docs.select(col(idCol) +: carryCols.map(col) :+
      explode_outer(filter(split(col(textCol), " "), w => w =!= ""))
        .as("token"): _*)
    val marked = toks.join(
      broadcast(vocab.select(col("token"), lit(1).as("in_vocab"))),
      Seq("token"), "left_outer")
    marked.groupBy(idCol, carryCols: _*).agg(
        count(col("token")).as("n_tokens"),
        sum(when(col("token").isNotNull && col("in_vocab").isNull, 1L)
          .otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_rate",
        round(col("oov_tokens").cast("double") /
          greatest(col("n_tokens"), lit(1L)), 6))
  }

  /** Keep only documents whose OOV share against `vocab` is at most
    * `maxOovRate`. The comparison is on the single-division rate, so
    * the gate is deterministic; full document rows survive (left-semi
    * on the id). */
  def oovGate(docs: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame, maxOovRate: Double): DataFrame = {
    val pass = oovRate(docs, idCol, textCol, vocab)
      .filter(col("oov_rate") <= maxOovRate)
      .select(col(idCol))
    docs.join(pass, Seq(idCol), "left_semi")
  }
}
