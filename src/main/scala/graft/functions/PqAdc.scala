package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** PQ asymmetric distance (ADC): sum of per-subspace LUT lookups.
  *
  * The Spark-native analog of the reference's precomputed `sim_table` scan
  * (reference index/impl/gamma_index_ivfpq.h:561-601): the query-side LUT
  * (`m` subspaces x `ksub` codebook entries of squared sub-distances) is a
  * flattened array<double> column (broadcast per probed centroid), the
  * doc-side PQ codes an array<int> column; the distance is
  * `Σ_j lut[j*ksub + code_j]` — one codegen'd loop, no boxing.
  */
case class PqAdcDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType | ShortType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<int|smallint> codes, array<double> lut), got " +
        s"${l.catalogString} / ${r.catalogString}")
  }

  private def codeIsShort: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == ShortType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]; val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val ksub = if (m == 0) 0 else lut.numElements() / m
    var j = 0; var s = 0.0
    val short = codeIsShort
    while (j < m) {
      val c = if (short) codes.getShort(j).toInt else codes.getInt(j)
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val j = ctx.freshName("j"); val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub"); val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val getCode = if (codeIsShort) s"(int) $codes.getShort($j)" else s"$codes.getInt($j)"
      s"""
         |int $m = $codes.numElements();
         |int $ksub = ($m == 0) ? 0 : $lut.numElements() / $m;
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = $getCode;
         |  $s += $lut.getDouble($j * $ksub + $c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
