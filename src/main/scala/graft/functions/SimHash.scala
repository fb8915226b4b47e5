package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64

/** One-pass 64-bit SimHash over a string array: xxhash64 (seed 42, Spark's
  * `xxhash64()`) per element, per-bit ±1 vote, sign → bit. Each element is
  * hashed ONCE and all 64 bit-counters update in a fused loop — the
  * higher-order-function formulation (64 × `aggregate(toks, ...)`) hashes
  * every element 64 times through interpreted lambdas and is ~3 orders of
  * magnitude slower at corpus scale.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  // Input must be array<string>; enforced at the call site (see
  // GraftFunctions) — ExpectsInputTypes is private[sql] in 4.x.
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42)
      var k = 0
      while (k < 64) {
        cnt(k) += ((h >>> k) & 1L).toInt
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (2 * cnt(k) > n) out |= (1L << k)
      k += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val cnt = ctx.freshName("cnt")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42);
         |  for (int $k = 0; $k < 64; $k++) {
         |    $cnt[$k] += (int) (($h >>> $k) & 1L);
         |  }
         |}
         |long $out = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if (2 * $cnt[$k] > $n) $out |= (1L << $k);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}
