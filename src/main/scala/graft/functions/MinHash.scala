package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash sketch over a string array: for each of the `numPerms`
  * universal-hash permutations h_p(x) = (a_p·murmur3(x) + b_p) mod (2^31-1),
  * the minimum over all elements.
  *
  * Equivalent to `numPerms` separate
  * `array_min(transform(shingles, s -> pmod(a*hash(s)+b, p)))` columns —
  * same murmur3 (seed 42, Spark's `hash()`), same pmod — but the element
  * hash is computed ONCE per shingle and all permutations update in a
  * single fused loop, so the work drops from perms × |arr| lambda calls to
  * |arr| hashes + perms × |arr| fused multiply-mod ops.
  */
case class MinHash(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty)

  private val MersennePrime = 2147483647L

  // Input must be array<string>; enforced at the call site rather than via
  // ExpectsInputTypes (private[sql] in 4.x).
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(as.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong
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
    val aRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nushSafe(ctx, ev, aRef, bRef)
  }

  private def nushSafe(ctx: CodegenContext, ev: ExprCode,
      aRef: String, bRef: String): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[${as.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $h = (long) org.apache.spark.unsafe.hash.Murmur3_x86_32
         |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |                       $s.numBytes(), 42);
         |  for (int $j = 0; $j < ${as.length}; $j++) {
         |    long $m = ($aRef[$j] * $h + $bRef[$j]) % ${MersennePrime}L;
         |    if ($m < 0) $m += ${MersennePrime}L;
         |    if ($m < $mins[$j]) $mins[$j] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}
