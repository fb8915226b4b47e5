package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays, accumulated in DOUBLE with a
  * strict left-to-right sum — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, (acc,v) -> acc+v)`
  * on equal-length arrays, but whole-stage-codegen'd: one fused loop, no
  * per-element lambda dispatch, no intermediate zipped array.
  *
  * This is the §2b preference order in action (SURVEY.md §7 "Built-in vs
  * custom Catalyst"): the composed higher-order form is semantically right
  * but interpreted per element; at millions of pairs × 64 dims the lambda
  * overhead dominates, so the hot path gets a scalar Expression with
  * `doGenCode`.
  */
/** @param strict when true, reproduce the higher-order form's null
  *   semantics exactly (result is NULL if the arrays differ in length or
  *   any element is null — `zip_with` pads the shorter side with nulls and
  *   `acc + null` poisons the sum). The rewrite rule
  *   (graft.functions.RewriteDotProduct) must use strict=true; direct
  *   callers on known-clean columns use the default fast path.
  */
case class DotProduct(left: Expression, right: Expression,
    strict: Boolean = false)
    extends BinaryExpression {

  // Inputs must be array<float>/array<double> (either mix); enforced at the
  // two call sites rather than via ExpectsInputTypes (private[sql] in 4.x).
  override def dataType: DataType = DoubleType

  override def nullable: Boolean = strict || super.nullable

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (strict && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // ev.isNull may ONLY be referenced on the strict path: strict
      // forces nullable=true, so nullSafeCodeGen declares the isNull
      // local. On the fast path with two NON-nullable children (e.g.
      // graft_dot(centroid, centroid) on a collect_list output) the
      // expression is non-nullable, no isNull local exists, and any
      // mention of it is a Janino "isNull_N is not an rvalue" compile
      // error — which silently demoted the whole projection to
      // interpreter mode (the r15 verdict's EdgeCaseSpec fallback).
      // CodegenFallbackSpec pins this under CODEGEN_ONLY.
      if (strict)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
           |if (!${ev.isNull}) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      else
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
