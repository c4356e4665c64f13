package graft.sources

import java.sql.SQLException

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** JDBC dialect for DuckDB (`jdbc:duckdb:...`).
  *
  * Spark's generic dialect classifies "object not found" by SQLState code;
  * DuckDB's JDBC driver reports catalog misses as a plain `Catalog Error`
  * message with no SQLState, so without this dialect `df.write.jdbc` dies
  * inside the table-existence probe instead of creating the table. DuckDB
  * is the one JDBC engine available offline (SURVEY.md §2.1 S6), so the
  * engine's JDBC source/sink capability is contract-tested through it.
  */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase.startsWith("jdbc:duckdb")

  override def isObjectNotFoundException(e: SQLException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("Catalog Error") || m.contains("does not exist")
  }

  @volatile private var registered = false

  /** Idempotently register with Spark's dialect registry. */
  def ensureRegistered(): Unit = if (!registered) synchronized {
    if (!registered) {
      JdbcDialects.registerDialect(this)
      registered = true
    }
  }
}
