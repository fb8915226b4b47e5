package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Fused 3-gram-shingle MinHash straight from the token array: for each
  * window (t_i, t_{i+1}, t_{i+2}) build the shingle string, murmur3 it once
  * (identical bytes+seed to `hash(concat_ws(' ', ...))`), and update all
  * permutation minima in one pass.
  *
  * Two scale wins over shingle-array materialization:
  *  - no shingle array column exists at all — the sketch is computed in the
  *    scan projection, so the shuffle carries 60 longs per doc instead of
  *    the (larger-than-text) shingle set;
  *  - no `array_distinct` — min() is duplicate-insensitive, so the
  *    multiset of shingles gives the same sketch as the set.
  */
case class MinHashTokens(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty)

  private val MersennePrime = 2147483647L

  // Input must be array<string> of tokens; enforced at the call site.
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(as.length)(Long.MaxValue)
    var i = 0
    while (i <= n - 3) {
      val sh = UTF8String.concatWs(space,
        arr.getUTF8String(i), arr.getUTF8String(i + 1),
        arr.getUTF8String(i + 2))
      val h = Murmur3_x86_32.hashUnsafeBytes(
        sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42).toLong
      var j = 0
      while (j < as.length) {
        val v = {
          val m = (as(j) * h + bs(j)) % MersennePrime
          if (m < 0) m + MersennePrime else m
        }
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhtAs", as, "long[]")
    val bRef = ctx.addReferenceObj("mhtBs", bs, "long[]")
    val spaceRef = ctx.addReferenceObj("mhtSpace", space,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mins = ctx.freshName("mins")
      val sh = ctx.freshName("sh")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[${as.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i <= $n - 3; $i++) {
         |  UTF8String $sh = UTF8String.concatWs($spaceRef,
         |      $arr.getUTF8String($i), $arr.getUTF8String($i + 1),
         |      $arr.getUTF8String($i + 2));
         |  long $h = (long) org.apache.spark.unsafe.hash.Murmur3_x86_32
         |      .hashUnsafeBytes($sh.getBaseObject(), $sh.getBaseOffset(),
         |                       $sh.numBytes(), 42);
         |  for (int $j = 0; $j < ${as.length}; $j++) {
         |    long $m = ($aRef[$j] * $h + $bRef[$j]) % ${MersennePrime}L;
         |    if ($m < 0) $m += ${MersennePrime}L;
         |    if ($m < $mins[$j]) $mins[$j] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashTokens =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_tokens"
}
