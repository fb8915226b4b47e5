package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Per-token hash for the portable SimHash mode: the first 8 bytes of the
  * MD5 digest, big-endian — bit-identical to what any engine with an `md5`
  * hex function can reproduce (DuckDB:
  * `('0x' || substr(md5(s), 1, 16))::UBIGINT`), unlike xxhash64 whose
  * seed-42 Spark flavor exists nowhere else. MessageDigest is held
  * thread-local so codegen'd loops pay no per-token allocation.
  */
object PortableHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5Hi64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong
  }
}

/** One-pass 64-bit SimHash over a string array: xxhash64 (seed 42, Spark's
  * `xxhash64()`) per element, per-bit ±1 vote, sign → bit. Each element is
  * hashed ONCE and all 64 bit-counters update in a fused loop — the
  * higher-order-function formulation (64 × `aggregate(toks, ...)`) hashes
  * every element 64 times through interpreted lambdas and is ~3 orders of
  * magnitude slower at corpus scale.
  *
  * `portable = true` swaps the token hash for [[PortableHash.md5Hi64]]:
  * slower per token (MD5 vs XXH64) but reproducible by any engine with an
  * md5 function — the mode to use when fingerprints must be verifiable
  * outside Spark, and the mode the DuckDB oracle checks value-for-value.
  */
case class SimHash(child: Expression, portable: Boolean = false)
    extends UnaryExpression {

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
      val h =
        if (portable) PortableHash.md5Hi64(s)
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
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
      val hashCall =
        if (portable)
          s"graft.functions.PortableHash.md5Hi64($s)"
        else
          s"""org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
             |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42)"""
            .stripMargin
      s"""
         |int $n = $arr.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $h = $hashCall;
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
