package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.StreamingTopK

/** Property coverage for the streaming top-k state transition: for
  * ARBITRARY streams and ARBITRARY slicings into micro-batches, folding
  * [[StreamingTopK.merge]] across the slices must equal the best-k of
  * the whole stream computed at once — replay-order independence, the
  * contract that makes the streamed leaderboard converge to the batch
  * operator's answer no matter how the source chops the log.
  */
object StreamingTopKProps extends Properties("StreamingTopK") {

  private val entryGen: Gen[(Double, Long)] = for {
    // duplicate-heavy scores so the tie-break carries the ordering
    s <- Gen.chooseNum(0, 9)
    t <- Gen.chooseNum(0L, 1000000L)
  } yield (s.toDouble, t)

  private val streamGen: Gen[List[(Double, Long)]] =
    Gen.listOf(entryGen).map(_.distinctBy(_._2)) // ties must be unique

  private val kGen: Gen[Int] = Gen.chooseNum(1, 8)

  private def slice[A](xs: List[A], cuts: List[Int]): List[List[A]] =
    cuts match {
      case Nil => List(xs)
      case c :: rest =>
        val (a, b) = xs.splitAt(c % (xs.length + 1))
        a :: slice(b, rest)
    }

  property("fold over any slicing == best-k of the whole stream") =
    forAll(streamGen, kGen, Gen.listOf(Gen.chooseNum(0, 50))) {
      (xs, k, cuts) =>
        val whole = StreamingTopK.merge(Seq.empty, xs, k)
        val folded = slice(xs, cuts).foldLeft(Seq.empty[(Double, Long)]) {
          (state, batch) => StreamingTopK.merge(state, batch, k)
        }
        folded == whole
    }

  property("result is the k best under (score desc, tie asc)") =
    forAll(streamGen, kGen) { (xs, k) =>
      val got = StreamingTopK.merge(Seq.empty, xs, k)
      val want = xs.sortBy { case (s, t) => (-s, t) }.take(k)
      got == want
    }

  property("NaN scores rank LARGEST, matching the batch operator's " +
    "interpreted Double ordering (not last, as sortBy key-negation would)") =
    forAll(streamGen, kGen) { (xs, k) =>
      val withNaN = (Double.NaN, -1L) :: (Double.NaN, -2L) :: xs
      val got = StreamingTopK.merge(Seq.empty, withNaN, k)
      // the two NaNs beat every finite score; between them tie asc wins
      val wantTies = (List(-2L, -1L) ++
        xs.sortBy { case (s, t) => (-s, t) }.map(_._2)).take(k)
      got.map(_._2) == wantTies
    }
}
