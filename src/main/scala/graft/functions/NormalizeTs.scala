package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, IntegralDivide, Literal, MicrosToTimestamp, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{LongType, TimestampType}

/** `normalize_ts(ts)` — fixture-layout-agnostic timestamp normalization
  * for SQL surfaces (declarative pipeline specs, ad-hoc spark.sql).
  *
  * The events fixture has shipped as both legacy nanos-as-long BIGINT
  * (under `spark.sql.legacy.parquet.nanosAsLong`) and native
  * TIMESTAMP(MICROS); spec SQL that hard-codes one layout's conversion
  * breaks when the driver regenerates the other (the round-7 failure
  * mode, which also hit the example feeds). This expression dispatches
  * on the RESOLVED input type, exactly mirroring
  * [[graft.Tables.tsNormalized]] (the Column-level twin for batch and
  * streaming readers — OpsSuite pins the two to identical output):
  * a BIGINT input is nanos and truncates ns→µs with integral division
  * (the same truncation DuckDB applies reading the nanos file); any
  * timestamp input casts to the session-zone timestamp (a no-op
  * relabel under the engine-wide UTC session timezone).
  *
  * RuntimeReplaceable: the optimizer substitutes the replacement tree,
  * so the hot path is built-in codegen'd arithmetic — this class never
  * evaluates.
  */
case class NormalizeTs(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case LongType =>
      MicrosToTimestamp(new IntegralDivide(child, Literal(1000L)))
    case _ =>
      // the timezone-dependent cast (NTZ → session-zone timestamp) only
      // resolves with an explicit zone; the engine pins UTC session-wide
      Cast(child, TimestampType,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeTs =
    copy(child = newChild)
}
