package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels as native Catalyst expressions — the
  * compressed-vector tier of the similarity-search stack (SURVEY.md
  * §2.8c L3). A d-dim vector is split into `m` subvectors; each
  * subvector is replaced by the index of its nearest codebook centroid,
  * so the vector stores as `m` bytes (64-dim float32 → 8 bytes = 32×).
  * Asymmetric-distance (ADC) scoring then ranks candidates from the
  * codes alone via a per-query lookup table, never touching the raw
  * vectors until re-rank. Both kernels run inside whole-stage codegen
  * (`doGenCode`), with the codebook attached as a JVM reference object —
  * no boxing, no per-row ArrayData walks over the codebook.
  */

/** `pq_encode(array<float|double>) -> binary(m)`: nearest-centroid code
  * per subspace, computed on the L2-normalized input (zero vectors pass
  * through unnormalized, matching the IVF assignment convention). Input
  * length must equal m·dsub of the codebook. Ties pick the lowest
  * centroid index (strict `<` scan). */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: empty codebook")
  require(codebooks.forall(_.length == codebooks.head.length),
    "pq_encode: ragged centroid counts across subspaces")
  require(codebooks.head.length <= 256,
    s"pq_encode: ${codebooks.head.length} centroids do not fit one byte")

  private val m = codebooks.length
  private val dsub = codebooks.head.head.length

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.simpleString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dt = elemType
    val dim = m * dsub
    if (a.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${a.numElements()} dims, codebook expects $dim")
    val v = new Array[Double](dim)
    var i = 0
    var n2 = 0.0
    while (i < dim) {
      v(i) = dt match {
        case FloatType => a.getFloat(i).toDouble
        case _         => a.getDouble(i)
      }
      n2 += v(i) * v(i); i += 1
    }
    val inv = if (n2 == 0.0) 1.0 else 1.0 / math.sqrt(n2)
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < cb.length) {
        var d = 0.0; var j = 0
        while (j < dsub) {
          val t = v(s * dsub + j) * inv - cb(c)(j)
          d += t * t; j += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(s) = (best & 0xff).toByte
      s += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val getter = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      val n2 = ctx.freshName("n2")
      val inv = ctx.freshName("inv")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bd = ctx.freshName("bd")
      val best = ctx.freshName("best")
      val cb = ctx.freshName("cb")
      s"""
         |if ($a.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException("pq_encode: vector has " +
         |    $a.numElements() + " dims, codebook expects ${m * dsub}");
         |}
         |double[] $v = new double[${m * dsub}];
         |double $n2 = 0.0;
         |for (int $i = 0; $i < ${m * dsub}; $i++) {
         |  $v[$i] = ${getter(a, i)};
         |  $n2 += $v[$i] * $v[$i];
         |}
         |double $inv = $n2 == 0.0 ? 1.0 : 1.0 / java.lang.Math.sqrt($n2);
         |byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[][] $cb = $cbRef[$s];
         |  int $best = 0; double $bd = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      double $t = $v[$s * $dsub + $j] * $inv - $cb[$c][$j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bd) { $bd = $d; $best = $c; }
         |  }
         |  $out[$s] = (byte) ($best & 0xff);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Builder for SQL registration: materializes the foldable codebook
    * literal into the JVM `double[][][]` the expression references, so
    * the generated encode loop never walks ArrayData for centroids. */
  def fromLiteral(child: Expression, cbExpr: Expression): PqEncode = {
    require(cbExpr.foldable,
      "pq_encode: codebook argument must be a foldable literal")
    val outer = cbExpr.eval().asInstanceOf[ArrayData]
    val cb = Array.tabulate(outer.numElements()) { i =>
      val mid = outer.getArray(i)
      Array.tabulate(mid.numElements())(j => mid.getArray(j).toDoubleArray())
    }
    PqEncode(child, cb)
  }
}

/** `pq_adc(binary, array<array<double>>) -> double`: asymmetric-distance
  * lookup — Σ_i lut[i][code[i]]. The LUT is per-query (subspace ×
  * centroid partial distances), built once on the driver for broadcast
  * query sides or produced by a join for large ones. NULL if either
  * side is NULL or a code byte indexes past its LUT row. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, array<array<double>>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val code = l.asInstanceOf[Array[Byte]]
    val lut = r.asInstanceOf[ArrayData]
    // a wrong-m code/LUT pairing must surface as NULL, never as a
    // silently truncated partial distance (ADVICE r4)
    if (code.length != lut.numElements()) return null
    val n = code.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      val row = lut.getArray(i)
      val idx = code(i) & 0xff
      if (idx >= row.numElements()) return null
      acc += row.getDouble(idx)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lut) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val idx = ctx.freshName("idx")
      s"""
         |double $acc = 0.0;
         |if ($code.length != $lut.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; $i < $code.length && !${ev.isNull}; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $lut.getArray($i);
         |  int $idx = $code[$i] & 0xff;
         |  if ($idx >= $row.numElements()) { ${ev.isNull} = true; }
         |  else { $acc += $row.getDouble($idx); }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
