package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingles(text, n)` — generator (UDTF) emitting one row per word n-gram.
  *
  * Tokenizes on single spaces (the documents fixture is space-separated;
  * FIXTURES.md) and emits the sliding n-gram windows joined by a single
  * space, one output row each — the shingling step of MinHash/Jaccard
  * near-duplicate detection (SURVEY.md §2.8b U3). Distinctness is NOT
  * applied here; dedup pipelines compose `shingles` with `DISTINCT` so
  * Catalyst can plan the shuffle.
  *
  * Runs as a `Generate` node: per-partition streaming, no driver state, so
  * it scales linearly with the corpus.
  */
case class Shingles(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def prettyName: String = "shingles"
  override def children: Seq[Expression] = Seq(text, n)

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && isIntegral(n.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int), got " +
        s"(${text.dataType.simpleString}, ${n.dataType.simpleString})")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    val k = n.eval(input)
    if (t == null || k == null) return Nil
    val size = k.asInstanceOf[Number].intValue()
    if (size <= 0) return Nil
    val words = t.asInstanceOf[UTF8String].toString
      .split(" ").filter(_.nonEmpty)
    if (words.length < size) Nil
    else words.sliding(size).map { w =>
      InternalRow(UTF8String.fromString(w.mkString(" ")))
    }.toSeq
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Shingles =
    copy(text = newChildren(0), n = newChildren(1))
}
