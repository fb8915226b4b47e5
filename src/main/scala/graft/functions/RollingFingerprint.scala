package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document fingerprints from the token array, returning
  * `array<long>[2]`:
  *
  *  - [0]: Rabin-Karp rolling hash `acc·31 + (hash(t) mod P) mod P`
  *    (P = 2^31−1) over the whole token stream — order-sensitive identity;
  *  - [1]: winnowing-lite minimum of hash over every 8-token window
  *    (whole-text hash when fewer than 8 tokens) — containment signal.
  *
  * Value-identical to the SQL formulation in graft.operators.TextOps
  * (xxhash64 seed 42 over the space-joined window bytes), but each token
  * is hashed once and windows are joined once, instead of per-window
  * interpreted `transform`/`slice`/`concat_ws` lambdas.
  *
  * `portable = true` swaps xxhash64 for [[PortableHash.md5Hi64]] (the
  * [[SimHash]] move): any engine with an md5 function can replay the
  * fold and the window minimum value-for-value — the mode the DuckDB
  * oracle checks (`floorMod` ↔ `((h % P) + P) % P`, the fold ↔
  * `list_reduce`, the window minimum ↔ `list_min` over SIGNED 64-bit
  * conversions of the md5 prefix).
  */
case class RollingFingerprint(child: Expression, portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  // CodegenFallback: the per-row work is the interior token loop (a tight
  // JVM loop already); per-row dispatch overhead is negligible here.

  private val P = 2147483647L
  private val WindowSize = 8

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val space = UTF8String.fromString(" ")

  private def hashOf(s: UTF8String): Long =
    if (portable) PortableHash.md5Hi64(s)
    else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes, 42)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var fp = 0L
    var i = 0
    while (i < n) {
      fp = (fp * 31L + math.floorMod(hashOf(arr.getUTF8String(i)), P)) % P
      i += 1
    }
    var winMin = Long.MaxValue
    if (n < WindowSize) {
      val parts = (0 until n).map(arr.getUTF8String)
      winMin = hashOf(UTF8String.concatWs(space, parts: _*))
    } else {
      var s = 0
      while (s <= n - WindowSize) {
        val parts = (s until s + WindowSize).map(arr.getUTF8String)
        val h = hashOf(UTF8String.concatWs(space, parts: _*))
        if (h < winMin) winMin = h
        s += 1
      }
    }
    new GenericArrayData(Array(fp, winMin))
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def prettyName: String =
    if (portable) "graft_fingerprint_portable" else "graft_fingerprint"
}
