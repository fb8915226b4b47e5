package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.functions.{PqAdc, PqEncode}

/** Property coverage for the round-17 native PQ expressions, against a
  * straight-line reference recomputation on ARBITRARY vectors and
  * ARBITRARY rectangular codebooks (the fixture pins check one frozen
  * codebook; these check the contract itself):
  *
  *  - PqEncode: codes = per-subspace argmin of the micro-quantized
  *    (x−c)² sum, ties to the SMALLEST code (the strict-< fold law the
  *    DuckDB oracle mirrors with ORDER BY d, k);
  *  - PqAdc: the exact integer Σ_m lut[m][codes[m]];
  *  - composition: ADC of a vector's own encode against a LUT built
  *    from the same distance is Σ_m min_k dist(m, k) — the per-subspace
  *    minima, the invariant the two expressions share one distance
  *    definition by.
  *
  * Interpreted `eval` is exercised here; the codegen path is pinned
  * bit-identical to it on real frames under CODEGEN_ONLY
  * (CodegenFallbackSpec, Round17OpsSpec).
  */
object PqProps extends Properties("pqExpressions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val geomGen = for {
    m <- Gen.choose(1, 4) // subspaces
    k <- Gen.choose(1, 9) // codes
    d <- Gen.choose(1, 5) // dims per subspace
  } yield (m, k, d)

  private def vecGen(n: Int): Gen[List[Float]] =
    Gen.listOfN(n, Gen.chooseNum(-2.0f, 2.0f))

  private def cbGen(m: Int, k: Int, d: Int): Gen[List[List[List[Double]]]] =
    Gen.listOfN(m, Gen.listOfN(k, Gen.listOfN(d,
      Gen.chooseNum(-2.0, 2.0))))

  private def distMicro(v: Seq[Float], cb: Seq[Seq[Seq[Double]]],
      m: Int, k: Int, d: Int): Long = {
    var acc = 0.0
    var i = 0
    while (i < d) {
      val x = v(m * d + i).toDouble - cb(m)(k)(i)
      acc += x * x
      i += 1
    }
    Math.round(acc * 1e6)
  }

  private def refCodes(v: Seq[Float], cb: Seq[Seq[Seq[Double]]],
      m: Int, k: Int, d: Int): Seq[Long] =
    (0 until m).map { mm =>
      (0 until k).minBy(kk => (distMicro(v, cb, mm, kk, d), kk)).toLong
    }

  property("PqEncode = reference argmin with smallest-code ties") =
    forAll(geomGen.flatMap { case (m, k, d) =>
      for { v <- vecGen(m * d); cb <- cbGen(m, k, d) }
        yield (m, k, d, v, cb)
    }) { case (m, k, d, v, cb) =>
      val cbArr = cb.map(_.map(_.toArray).toArray).toArray
      val got = PqEncode(
        Literal.create(v, ArrayType(FloatType)), cbArr)
        .eval().asInstanceOf[ArrayData].toLongArray.toSeq
      got == refCodes(v, cb, m, k, d)
    }

  property("PqAdc = exact integer lookup sum") =
    forAll(geomGen.flatMap { case (m, k, _) =>
      for {
        lut <- Gen.listOfN(m, Gen.listOfN(k, Gen.chooseNum(0L, 1L << 40)))
        codes <- Gen.listOfN(m, Gen.choose(0, k - 1).map(_.toLong))
      } yield (lut, codes)
    }) { case (lut, codes) =>
      val got = PqAdc(
        Literal.create(lut, ArrayType(ArrayType(LongType))),
        Literal.create(codes, ArrayType(LongType)))
        .eval().asInstanceOf[Long]
      got == codes.zipWithIndex.map { case (c, m) => lut(m)(c.toInt) }.sum
    }

  property("ADC of a vector's own encode = sum of per-subspace minima") =
    forAll(geomGen.flatMap { case (m, k, d) =>
      for { v <- vecGen(m * d); cb <- cbGen(m, k, d) }
        yield (m, k, d, v, cb)
    }) { case (m, k, d, v, cb) =>
      val cbArr = cb.map(_.map(_.toArray).toArray).toArray
      val codes = PqEncode(
        Literal.create(v, ArrayType(FloatType)), cbArr)
        .eval().asInstanceOf[ArrayData]
      val lut = (0 until m).map(mm =>
        (0 until k).map(kk => distMicro(v, cb, mm, kk, d)))
      val adc = PqAdc(
        Literal.create(lut, ArrayType(ArrayType(LongType))),
        Literal(codes, ArrayType(LongType, containsNull = false)))
        .eval().asInstanceOf[Long]
      adc == (0 until m).map(mm =>
        (0 until k).map(kk => distMicro(v, cb, mm, kk, d)).min).sum
    }
}
