package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler(string, string) -> double` — the record-linkage /
  * fuzzy-join similarity kernel, as a native Catalyst expression so the
  * pairwise hot loop stays inside whole-stage codegen (a Scala UDF would
  * box two strings per candidate pair; at 100 TB the candidate join is
  * the dominant cost). Codegen emits a call to the static
  * [[JaroWinkler.similarity]] kernel — one virtual-free invocation per
  * row over the unsafe UTF8String bytes.
  *
  * Semantics are pinned to the TEXTBOOK Jaro–Winkler that DuckDB's
  * `jaro_winkler_similarity` implements (verified bit-for-bit on probe
  * pairs, so the oracle can hash-compare): match window
  * ⌊max(l1,l2)/2⌋−1, transpositions = half the out-of-order matches,
  * jaro = (m/l1 + m/l2 + (m−t)/m)/3 with exactly that association, and
  * the Winkler prefix bonus (≤ 4 chars, scale 0.1) applied only when
  * jaro exceeds the 0.7 boost threshold. Equal strings → 1.0 (even when
  * empty); otherwise an empty side → 0.0. NULL in, NULL out.
  *
  * Comparison is by UTF-16 code unit (Java chars), which agrees with
  * byte-wise ASCII comparison on the fixture corpus; non-BMP input would
  * need grapheme-aware matching on BOTH engines to stay comparable. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code. */
  def similarity(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val md = m.toDouble
    // association pinned to the oracle: (m/l1 + m/l2 + (m−t)/m) / 3
    val jaro = (md / l1 + md / l2 + (md - half) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val lim = math.min(4, math.min(l1, l2))
      while (p < lim && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
