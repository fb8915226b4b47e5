package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 3-gram shingle set from a token array, one native pass —
  * value-identical to the declarative
  * `array_distinct(transform(sequence(0, n-3), i -> concat_ws(' ', ...)))`
  * chain (first-occurrence order, `[]` for < 3 tokens and for NULL input,
  * matching that CASE's ELSE arm under `size(NULL) = NULL`).
  *
  * Why native and not the higher-order-function chain: lambda expressions
  * don't participate in codegen, and worse, `InferFiltersFromGenerate`
  * copies an `explode`'s generator child into an inferred non-null/
  * non-empty Filter — with the interpreted transform-chain as that child,
  * every downstream `explode(shingles)` paid 3–4 re-evaluations of the
  * whole shingle build per row (measured 7.6 s vs 0.8 s for one pass on
  * the sf0.1 corpus store side). A cheap one-pass expression makes the
  * duplicated evaluation harmless instead of fighting the optimizer rule.
  */
case class ShingleSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val space = UTF8String.fromString(" ")

  private def build(value: Any): GenericArrayData = {
    if (value == null) return new GenericArrayData(Array.empty[Any])
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i <= n - 3) {
      seen.add(UTF8String.concatWs(space,
        arr.getUTF8String(i), arr.getUTF8String(i + 1),
        arr.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def eval(input: InternalRow): Any = build(child.eval(input))

  override protected def nullSafeEval(input: Any): Any = build(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("shingleSet", this, classOf[ShingleSet].getName)
    val childGen = child.genCode(ctx)
    val in = ctx.freshName("shingleIn")
    ev.copy(
      code = code"""
        |${childGen.code}
        |Object $in = ${childGen.isNull} ? null : (Object) ${childGen.value};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |    (org.apache.spark.sql.catalyst.util.ArrayData)
        |    $selfRef.javaBuild($in);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  /** Codegen entry point (public for generated code). */
  def javaBuild(value: Any): ArrayData = build(value)

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}
