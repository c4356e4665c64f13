package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernels for the SRP join-rewrite expressions (the
  * [[graft.functions.Bpe]] pattern: generated code calls a plain JVM
  * static, so the expressions stay inside whole-stage codegen with one
  * virtual call per row instead of falling back to interpreted eval). */
object SrpKernel {

  /** splitmix64 of (seed, a, b) → double in [-1, 1]. Pure, stateless —
    * the hyperplane family exists only as this formula, so the rewrite
    * needs no plane table and no knowledge of the vector dimension at
    * plan time. */
  @inline def h(seed: Long, a: Long, b: Long): Double = {
    var z = seed * 0x632BE59BD9B4E019L + a * 0x9E3779B97F4A7C15L +
      b * 0xD1B54A32D192ED03L + 0x8CB92BA72F3D8DD7L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue
  }

  /** nBits sign-random-projection bits over implicit hash planes,
    * packed into nBits/bandBits band keys. Zero vectors take the
    * deterministic all-ones-band path (dot 0 ≥ 0), matching
    * [[graft.ops.Similarity.srpSignatures]] semantics. */
  def bands(v: ArrayData, elemIsFloat: Boolean, nBits: Int,
            bandBits: Int, seed: Long): ArrayData = {
    val dim = v.numElements()
    val nBands = nBits / bandBits
    val out = new Array[Long](nBands)
    var bit = 0
    while (bit < nBits) {
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val x = if (elemIsFloat) v.getFloat(d).toDouble else v.getDouble(d)
        dot += x * h(seed, bit, d)
        d += 1
      }
      if (dot >= 0) out(bit / bandBits) |= 1L << (bit % bandBits)
      bit += 1
    }
    new GenericArrayData(out)
  }

  /** Index of the first position where two long arrays agree, −1 when
    * none (or lengths differ at every shared position). */
  def firstEqual(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return i
      i += 1
    }
    -1
  }
}

/** `srp_bands(array<float|double>, nBits, bandBits, seed) -> array<long>`
  * — sign-random-projection band keys against the IMPLICIT splitmix64
  * hyperplane family (no plane table, dimension discovered per row).
  * Bit b of the signature is the sign of `Σ_d v[d]·h(seed, b, d)`;
  * bits pack `bandBits` at a time into `nBits/bandBits` keys. Built
  * for [[graft.plans.SrpJoinRewrite]], which needs a plane source it
  * can synthesize at PLAN time; the explicit-plane operator tier
  * ([[graft.ops.Similarity.srpSignatures]]) stays the right call when
  * the plane table is a persisted artifact shared across jobs. */
case class SrpBands(child: Expression, nBits: Int, bandBits: Int,
                    seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "srp_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  require(bandBits >= 1 && bandBits <= 62,
    s"srp_bands: bandBits must be in [1, 62], got $bandBits")
  require(nBits >= bandBits && nBits % bandBits == 0,
    s"srp_bands: nBits ($nBits) must be a positive multiple of " +
      s"bandBits ($bandBits)")

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SrpKernel.bands(input.asInstanceOf[ArrayData], elemIsFloat, nBits,
      bandBits, seed)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpKernel.bands($c, $elemIsFloat, " +
        s"$nBits, $bandBits, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

/** `first_equal_band(array<long>, array<long>) -> int` — index of the
  * first agreeing position, −1 when none. The [[graft.plans.SrpJoinRewrite]]
  * dedup predicate: a pair colliding on k bands would otherwise emit k
  * times through the exploded band join, so the rewrite keeps a match
  * only at its FIRST agreeing band (`first_equal_band(ba, bb) = band`). */
case class FirstEqualBand(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "first_equal_band"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<long>, array<long>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    SrpKernel.firstEqual(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SrpKernel.firstEqual($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualBand =
    copy(left = newLeft, right = newRight)
}
