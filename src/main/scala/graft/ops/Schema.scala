package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-manipulation stages — the conformance surface of a spec-driven
  * ETL framework: landing zones receive drifting, nested, badly-named
  * schemas, and every downstream contract wants flat, sane, typed
  * columns. All three operators are pure projections (rename/cast/
  * struct-field access), so they cost nothing beyond the scan and stay
  * inside whole-stage codegen at any scale.
  */
object Schema {

  /** Recursively flatten struct columns into leaf columns named
    * `parent_child_leaf`. Arrays/maps pass through unexpanded (exploding
    * is a row-multiplying decision the caller owns — see F11). */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def leaves(prefix: String, ref: Column,
               dt: DataType): Seq[(String, Column)] = dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f =>
          leaves(s"$prefix$sep${f.name}", ref.getField(f.name), f.dataType))
      case _ => Seq(prefix -> ref)
    }
    val cols = df.schema.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        st.fields.toSeq.flatMap(f =>
          leaves(s"$name$sep${f.name}", col(name).getField(f.name), f.dataType))
      case StructField(name, _, _, _) => Seq(name -> col(name))
    }
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** Conform column names to lowercase snake_case identifiers: trim,
    * lowercase, every run of non-alphanumerics becomes one underscore,
    * leading digits get a guard prefix. Collisions after sanitization
    * are an error (silent last-wins would drop data). */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    def clean(n: String): String = {
      val s = n.trim.toLowerCase
        .replaceAll("[^a-z0-9]+", "_")
        .replaceAll("^_+|_+$", "")
      val base = if (s.isEmpty) "col" else s
      if (base.head.isDigit) s"c_$base" else base
    }
    val names = df.columns.map(clean)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    require(dups.isEmpty,
      s"sanitizeColumns: name collision after cleaning: ${dups.mkString(", ")}")
    df.toDF(names.toIndexedSeq: _*)
  }

  /** Conform `df` to the target DDL schema (e.g. `"a INT, b STRING"`):
    * target columns selected in target order; type mismatches cast
    * (`strict = false` uses try_cast → NULL on bad values, the
    * quarantine-friendly mode; `strict = true` casts under ANSI and
    * errors on the first bad value); columns missing from the input
    * become typed NULLs only in permissive mode; extra input columns
    * drop. */
  def conform(df: DataFrame, ddl: String, strict: Boolean = false): DataFrame = {
    val target = StructType.fromDDL(ddl)
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.toSeq.map { f =>
      have.get(f.name) match {
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(_) if strict => col(f.name).cast(f.dataType)
        case Some(_) => try_cast(col(f.name), f.dataType)
        case None =>
          require(!strict, s"conform: missing required column '${f.name}'")
          lit(null).cast(f.dataType)
      }
    }
    df.select(cols.zip(target.fields).map { case (c, f) => c.as(f.name) }: _*)
  }

  private def try_cast(c: Column, dt: DataType): Column =
    c.try_cast(dt.sql)
}
