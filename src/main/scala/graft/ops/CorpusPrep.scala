package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composite pipeline a
  * 100 TB pretraining-data run actually executes, built from the engine's
  * operators in the canonical order —
  *
  *   1. quality gate (cheap projections first: token counts, stopword and
  *      punctuation ratios — drops junk before anything expensive),
  *   2. language filter (stopword-vote language ID),
  *   3. exact dedup (content-hash),
  *   4. near-dedup (MinHash-LSH banded candidate join),
  *
  * ordered so each stage shrinks the input of the costlier stage after it.
  * Returns the cleaned corpus plus a per-stage attrition report (the
  * numbers a data curator audits).
  */
object CorpusPrep {

  final case class PrepConfig(
      minTokens: Long = 5,
      maxTokens: Long = 1 << 20,
      maxStopwordRatio: Double = 0.9,
      minStopwordRatio: Double = 0.0,
      allowedLangs: Seq[String] = Nil, // empty = keep all
      nearDupThreshold: Double = 0.8,
      shingleN: Int = 3)

  final case class PrepReport(
      input: Long, afterQuality: Long, afterLang: Long,
      afterExact: Long, kept: Long)

  def prepare(docs: DataFrame, idCol: String, textCol: String,
              cfg: PrepConfig = PrepConfig()): (DataFrame, PrepReport) = {
    val input = docs.count()

    val quality = TextAnalysis.qualityScore(docs, idCol, textCol)
      .filter(col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
        col("stopword_ratio")
          .between(cfg.minStopwordRatio, cfg.maxStopwordRatio))
      .select(col(idCol))
    val afterQualityDf = docs.join(quality, Seq(idCol), "left_semi").cache()
    val afterQuality = afterQualityDf.count()

    val afterLangDf =
      if (cfg.allowedLangs.isEmpty) afterQualityDf
      else {
        val langs = TextAnalysis.languageId(afterQualityDf, idCol, textCol)
          .filter(col("lang_guess").isin(cfg.allowedLangs: _*))
          .select(col(idCol))
        afterQualityDf.join(langs, Seq(idCol), "left_semi").cache()
      }
    val afterLang = afterLangDf.count()

    val (cleaned, dedupReport) = Dedup.dedupCorpus(
      afterLangDf, idCol, textCol, cfg.shingleN, cfg.nearDupThreshold)

    (cleaned, PrepReport(
      input = input,
      afterQuality = afterQuality,
      afterLang = afterLang,
      afterExact = afterLang - dedupReport.exactRemoved,
      kept = dedupReport.kept))
  }
}
