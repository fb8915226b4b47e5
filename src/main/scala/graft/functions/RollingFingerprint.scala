package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document fingerprints from the token array, returning
  * `array<long>[2]`:
  *
  *  - [0]: Rabin-Karp rolling hash `acc·31 + (xxhash64(t) mod P) mod P`
  *    (P = 2^31−1) over the whole token stream — order-sensitive identity;
  *  - [1]: winnowing-lite minimum of xxhash64 over every 8-token window
  *    (whole-text hash when fewer than 8 tokens) — containment signal.
  *
  * Value-identical to the SQL formulation in graft.operators.TextOps
  * (xxhash64 seed 42 over the space-joined window bytes), but each token
  * is hashed once and windows are joined once, instead of per-window
  * interpreted `transform`/`slice`/`concat_ws` lambdas.
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {
  // CodegenFallback: the per-row work is the interior token loop (a tight
  // JVM loop already); per-row dispatch overhead is negligible here.

  private val P = 2147483647L
  private val WindowSize = 8

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var fp = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, 42)
      fp = (fp * 31L + math.floorMod(h, P)) % P
      i += 1
    }
    var winMin = Long.MaxValue
    if (n < WindowSize) {
      val parts = (0 until n).map(arr.getUTF8String)
      val joined = UTF8String.concatWs(space, parts: _*)
      winMin = XXH64.hashUnsafeBytes(joined.getBaseObject,
        joined.getBaseOffset, joined.numBytes, 42)
    } else {
      var s = 0
      while (s <= n - WindowSize) {
        val parts = (s until s + WindowSize).map(arr.getUTF8String)
        val joined = UTF8String.concatWs(space, parts: _*)
        val h = XXH64.hashUnsafeBytes(joined.getBaseObject,
          joined.getBaseOffset, joined.numBytes, 42)
        if (h < winMin) winMin = h
        s += 1
      }
    }
    new GenericArrayData(Array(fp, winMin))
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint"
}
