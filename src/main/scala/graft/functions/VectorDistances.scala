package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector distance kernels as codegen'd Catalyst expressions.
  *
  * These are the Spark-native re-expression of the reference's SIMD float
  * kernels: `fvec_L2sqr` / `fvec_inner_product` (used at
  * reference index/impl/gamma_index_flat.cc:196,221 and
  * gamma_index_ivfpq.cc:659-661) and the Hamming computer of the binary
  * index (reference index/impl/gamma_index_binary_ivf.cc:109-118). Instead
  * of hand-vectorized C, each kernel is a whole-stage-codegen friendly
  * `BinaryExpression` over `array<float|double>` producing a double, so
  * Tungsten keeps the loop on primitive `ArrayData` with no boxing and the
  * JIT auto-vectorizes.
  *
  * All arithmetic is done in double regardless of input element type so
  * results are bit-comparable with a DuckDB oracle computing in double.
  */
abstract class VectorBinaryKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline protected final def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected def getterJava(v: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** Squared L2 distance: sum_i (a_i - b_i)^2 (`fvec_L2sqr` analog). */
case class L2SqDistance(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { val d = get(a, i, lf) - get(b, i, rf); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getterJava(a, i, elemIsFloat(left))} - ${getterJava(b, i, elemIsFloat(right))};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Inner product: sum_i a_i * b_i (`fvec_inner_product` analog). */
case class InnerProduct(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "inner_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { s += get(a, i, lf) * get(b, i, rf); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (${getterJava(a, i, elemIsFloat(left))}) * (${getterJava(b, i, elemIsFloat(right))});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity: dot(a,b) / (|a| * |b|); 0.0 when either norm is 0.
  * The reference declares a Cosine metric (index/retrieval_model.h:20) but
  * its kernels implement IP over pre-normalized vectors; we provide the
  * real thing.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
    while (i < n) {
      val x = get(a, i, lf); val y = get(b, i, rf)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getterJava(a, i, elemIsFloat(left))};
         |  double $y = ${getterJava(b, i, elemIsFloat(right))};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance over packed binary codes (`BinaryType`), the metric of
  * the reference's BINARYIVF model (index/impl/gamma_index_binary_ivf.cc).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "hamming"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming requires binary inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]; val b = r.asInstanceOf[Array[Byte]]
    val n = math.min(a.length, b.length)
    var i = 0; var s = 0
    while (i < n) { s += Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    // length mismatch: count the tail of the longer code as all-different
    var j = n
    val longer = if (a.length > b.length) a else b
    while (j < longer.length) { s += Integer.bitCount(longer(j) & 0xff); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val longer = ctx.freshName("longer"); val j = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |byte[] $longer = ($a.length > $b.length) ? $a : $b;
         |for (int $j = $n; $j < $longer.length; $j++) {
         |  $s += java.lang.Integer.bitCount($longer[$j] & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
