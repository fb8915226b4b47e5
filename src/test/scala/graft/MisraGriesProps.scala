package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.HeavyHitters

/** Property coverage for the Misra–Gries heavy-hitter summary: for
  * ARBITRARY streams, ARBITRARY segmentations of the stream into
  * partitions, and ARBITRARY merge orders (the distribution
  * nondeterminism Spark introduces), the merged summary must keep the
  * mergeable-summaries guarantees:
  *
  *  - size bound: never more than k counters;
  *  - underestimate: est(x) <= freq(x) for every key;
  *  - error bound:  freq(x) - est(x) <= n/(k+1) over the COMBINED n
  *    (Agarwal et al., "Mergeable Summaries");
  *  - superset: every key with freq(x) > n/(k+1) survives — the property
  *    agg_heavy_hitters' exactness rests on.
  */
object MisraGriesProps extends Properties("misraGries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val streamGen = for {
    n <- Gen.choose(1, 400)
    nKeys <- Gen.choose(1, 12)
    // zipf-ish skew: low keys much more frequent, so true heavy hitters
    // exist at small k
    keys <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.choose(0L, 1L)),
      (3, Gen.choose(2L, 4L)),
      (1, Gen.choose(5L, nKeys.toLong.max(5L)))))
  } yield keys

  private val cutsGen = Gen.listOfN(6, Gen.choose(0.0, 1.0))

  property("merged summary keeps size/underestimate/error/superset") =
    forAll(streamGen, Gen.choose(2, 8), cutsGen) { (stream, k, cuts) =>
      val mg = HeavyHitters.MisraGriesAgg(k)
      // split the stream at arbitrary points into per-"partition" buffers
      val bounds = (cuts.map(c => (c * stream.length).toInt) ++
        Seq(0, stream.length)).distinct.sorted
      val segments = bounds.zip(bounds.tail).map { case (a, b) =>
        stream.slice(a, b).foldLeft(mg.zero)(mg.reduce)
      }
      // fold-merge in the (arbitrary) segment order
      val merged = segments.foldLeft(mg.zero)(mg.merge)
      val freq = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val n = stream.length.toLong
      val bound = n / (k + 1)
      val sizeOk = merged.counts.size <= k
      val underOk = merged.counts.forall { case (x, est) =>
        est <= freq.getOrElse(x, 0L)
      }
      val errOk = freq.forall { case (x, f) =>
        f - merged.counts.getOrElse(x, 0L) <= bound
      }
      val supersetOk = freq.forall { case (x, f) =>
        f <= bound || merged.counts.contains(x)
      }
      sizeOk && underOk && errOk && supersetOk
    }
}
