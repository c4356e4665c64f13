package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear bag-of-words text classification at corpus scale — the
  * "quality classifier" stage of modern pretraining pipelines (a
  * fasttext-style linear model scoring every document, with a
  * threshold deciding what enters the training set).
  *
  * Two execution paths with identical semantics:
  *
  *  - [[scoreWithMap]]: the weight vector rides into the plan as a map
  *    literal, and the score is a pure codegen'd projection
  *    (split → transform → aggregate → sigmoid). ZERO shuffles, zero
  *    joins — at 100 TB this is one pass over the text column. Right
  *    whenever the vocabulary fits comfortably in the plan (the usual
  *    case: quality classifiers run tens of thousands of features).
  *  - [[scoreWithJoin]]: explode tokens, broadcast-join the weight
  *    table, re-aggregate per doc. One shuffle on the doc id. Right
  *    when the vocabulary is too large to inline.
  *
  * Both tokenize identically (lower-case, split on non-letter runs)
  * and weight by term FREQUENCY (each occurrence adds its weight —
  * the fasttext convention up to its length normalization). The
  * equality of the two paths is a suite property.
  */
object Classifier {

  private def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z]+"), t => t =!= "")

  private def sigmoid(x: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-x))

  /** Append `score` = sigmoid(bias + Σ_occurrences weight(token)) as a
    * pure projection; unknown tokens contribute 0. */
  def scoreWithMap(docs: DataFrame, textCol: String,
                   weights: Map[String, Double], bias: Double): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val wm = typedLit(weights)
    val raw = aggregate(
      transform(tokens(col(textCol)),
        t => coalesce(element_at(wm, t), lit(0.0))),
      lit(bias), (acc, x) => acc + x)
    docs.withColumn("score", sigmoid(raw))
  }

  /** Same score via explode + broadcast weight join + per-doc
    * re-aggregation, for vocabularies too large to inline. `weights`
    * has columns (token, weight). Docs with no known token keep
    * sigmoid(bias). */
  def scoreWithJoin(docs: DataFrame, idCol: String, textCol: String,
                    weights: DataFrame, bias: Double): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("__tok"))
    val sums = tok
      .join(broadcast(weights.select(col("token").as("__tok"),
        col("weight").cast("double").as("__w"))), Seq("__tok"))
      .groupBy(idCol).agg(sum("__w").as("__sw"))
    docs.join(sums, Seq(idCol), "left")
      .withColumn("score",
        sigmoid(lit(bias) + coalesce(col("__sw"), lit(0.0))))
      .drop("__sw")
  }
}
