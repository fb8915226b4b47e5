package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native asymmetric-distance (ADC) lookup sum for product quantization:
  * given a query's LUT column (`array<array<long>>` — per subspace m, the
  * micro-quantized distance to every code) and a corpus row's PQ codes
  * (`array<long>`), returns the exact integer Σ_m lut[m][codes[m]] — the
  * classic PQ ADC estimator (Jégou, Douze & Schmid 2011, §IV-A).
  *
  * Bit-identical to the higher-order form
  * `aggregate(sequence(0, M-1), 0L, (acc, m) ->
  *    acc + element_at(element_at(lut, m+1), int(codes[m]) + 1))`
  * (exact long adds — order-free), but whole-stage-codegen'd: the HOF
  * form runs INTERPRETED per element, and at corpus × query pair volume
  * the lambda dispatch made the compressed-index scan LOSE to the
  * codegen'd brute-force dot (PQSCALE_r16: ADC 6.4 s vs brute 3.7 s at
  * 1M vectors) — the DotProduct.scala precedent applied to the PQ hot
  * loop, per the r16 verdict's top next-step.
  *
  * Contract (engine-internal): both arrays are engine-produced and
  * element-non-null; every codes[m] indexes within lut[m]. Child-level
  * nulls are handled by nullSafeCodeGen/nullSafeEval; the generated code
  * never references `ev.isNull` (the r15 Janino-fallback lesson,
  * CodegenFallbackSpec).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  /** The expression is user-callable SQL (`graft_pq_adc`), so mistyped
    * arguments must fail analysis — without this check an array<int>
    * lut/codes would be reinterpreted by getLong and return silently
    * wrong sums.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_pq_adc requires (lut: array<array<bigint>>, " +
          s"codes: array<bigint>), got (${l.catalogString}, " +
          s"${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0L
    var i = 0
    while (i < m) {
      acc += lut.getArray(i).getLong(codes.getLong(i).toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $codes.numElements();
         |long $acc = 0L;
         |for (int $m = 0; $m < $n; $m++) {
         |  $acc += $lut.getArray($m).getLong((int) $codes.getLong($m));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_adc"
}
