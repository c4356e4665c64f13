package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a runnable
  * query over a scale-factor fixture directory; `oracleSql` carries the
  * DuckDB-dialect equivalent for the driver's hash-match correctness gate
  * (SURVEY.md §2.9 corpus, §5.4 dialect translations).
  */
object SparkEntry {

  /** All contract queries, in corpus order. */
  val corpus: Seq[Q] =
    Relational.defs ++ Windows.defs ++ Scalars.defs ++ TextVec.defs ++
      ScaleOps.defs ++ Analytics.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q11_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    corpus.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    corpus.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
