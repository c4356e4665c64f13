package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction — the classic distributed-text workload
  * (term → sorted posting list), and the substrate for the contamination
  * / n-gram-overlap checks elsewhere in the layer: a standing index lets
  * a benchmark-overlap query probe terms instead of rescanning the
  * corpus.
  *
  * Scale shape: explode to (term, doc) pairs, one distinct (shuffle on
  * the pair), one groupBy term (shuffle on term) whose aggregation
  * builds the posting list. Posting lists are per-term — the classic
  * skew risk is stopword terms with corpus-sized lists, which is why
  * `minDf`/`maxDfShare` exist: production indexes drop or truncate the
  * head terms (a maxDfShare of 0.5 halves the worst list at any corpus
  * size).
  */
object Indexing {

  /** One row per term: (term, df, postings) with postings ascending.
    * Tokenization is the engine-wide lower + single-space split; terms
    * in fewer than `minDf` or more than `maxDfShare`·N docs are dropped
    * (the latter computed against the distinct document count, one tiny
    * extra aggregate). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1L, maxDfShare: Double = 1.0): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxDfShare > 0.0 && maxDfShare <= 1.0,
      s"maxDfShare must be in (0, 1], got $maxDfShare")
    val pairs = docs
      .select(col(idCol).as("doc"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val nDocs = docs.agg(countDistinct(col(idCol)).as("__n"))
    pairs
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc"))).as("postings"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= minDf &&
        col("df") <= lit(maxDfShare) * col("__n"))
      .drop("__n")
  }
}
