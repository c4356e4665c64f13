package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `winnow(text, k, w) -> array<bigint>` — document fingerprinting by
  * winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm):
  *
  *  1. Karp-Rabin rolling hash over every character k-gram (base 257,
  *     wrapping 64-bit arithmetic — one multiply+add per character, O(n)).
  *  2. Slide a window of `w` consecutive k-gram hashes; record the minimum
  *     of each window (rightmost on ties — the canonical rule that makes
  *     fingerprints position-robust).
  *  3. Emit the distinct recorded hashes in first-seen order.
  *
  * Guarantees: any shared substring of length >= k + w - 1 between two
  * documents yields at least one shared fingerprint. Per-row streaming
  * kernel — no state across rows, so it scales embarrassingly parallel.
  */
case class Winnow(text: Expression, k: Expression, w: Expression)
    extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "winnow"
  override def first: Expression = text
  override def second: Expression = k
  override def third: Expression = w
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType &&
        isIntegral(k.dataType) && isIntegral(w.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int, int)")

  override def nullSafeEval(t: Any, kAny: Any, wAny: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val kk = kAny.asInstanceOf[Number].intValue()
    val ww = wAny.asInstanceOf[Number].intValue()
    new GenericArrayData(Winnow.fingerprints(s, kk, ww))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Winnow =
    copy(text = newFirst, k = newSecond, w = newThird)
}

object Winnow {
  private val Base = 257L

  /** Reference kernel (shared by the expression and the test suite). */
  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
    if (k <= 0 || w <= 0 || s.length < k) return Array.empty
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    // Karp-Rabin: h(i+1) = (h(i) - s(i)*B^(k-1)) * B + s(i+k)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    if (n <= w) {
      // Single window: rightmost minimum.
      var min = 0
      i = 1
      while (i < n) { if (hashes(i) <= hashes(min)) min = i; i += 1 }
      return Array(hashes(min))
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var winMin = -1
    i = 0
    while (i + w <= n) {
      if (winMin < i) {
        winMin = i
        var p = i + 1
        while (p < i + w) { if (hashes(p) <= hashes(winMin)) winMin = p; p += 1 }
        out += hashes(winMin)
      } else {
        // window slid by one; only the new rightmost element can displace
        if (hashes(i + w - 1) <= hashes(winMin)) {
          winMin = i + w - 1
          out += hashes(winMin)
        }
      }
      i += 1
    }
    out.toArray
  }
}
