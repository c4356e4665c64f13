package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** One contract query: a Spark implementation plus (optionally) the
  * equivalent DuckDB SQL the driver's oracle runs on the same parquet
  * fixtures (SURVEY.md §2.9/§5.4). Queries without an oracle get the
  * driver's weaker rows-only check (approximate/sketch/LSH operators,
  * where exact cross-engine hashes are not defined).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Support {
  /** Spark SQL text differs from the DuckDB translation. */
  def sqlQ(name: String, sparkSql: String, duckSql: String): Q =
    Q(name, (s, dir) => { Tables.register(s, dir); s.sql(sparkSql) }, Some(duckSql))

  /** Identical ANSI text runs on both engines. */
  def sameQ(name: String, sql: String): Q = sqlQ(name, sql, sql)

  /** DataFrame/Dataset-API implementation with a DuckDB oracle. */
  def dfQ(name: String, duckSql: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => { Tables.register(s, dir); build(s, dir) }, Some(duckSql))

  /** Spark-only (no SQL-expressible oracle): rows-only driver check. */
  def sparkOnly(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => { Tables.register(s, dir); build(s, dir) }, None)
}
