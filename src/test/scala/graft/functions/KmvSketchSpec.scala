package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** KMV buffer algebra: the sketch must be a pure function of the input
  * SET — independent of arrival order, duplication, and merge shape —
  * or the map-side-partial aggregation would be nondeterministic. */
class KmvSketchSpec extends AnyFunSuite {

  private val agg = new KmvAggregator(4)

  private def reduceAll(xs: Seq[String]): KmvBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps the k smallest, sorted and deduplicated") {
    val b = reduceAll(Seq("d", "b", "f", "b", "a", "e", "c", "a"))
    assert(b.hs == Vector("a", "b", "c", "d"))
    assert(agg.finish(b) == KmvResult(4, "d"))
  }

  test("arrival order never matters") {
    val xs = Seq("q", "g", "z", "a", "m", "g", "b", "x", "a")
    xs.permutations.take(50).foreach { p =>
      assert(reduceAll(p) == reduceAll(xs), s"order-dependent for $p")
    }
  }

  test("merge equals reducing the union, for any split") {
    val xs = Vector("h", "c", "a", "f", "c", "b", "z", "a", "d")
    val whole = reduceAll(xs)
    (0 to xs.length).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      assert(agg.merge(reduceAll(l), reduceAll(r)) == whole, s"split at $cut diverged")
      assert(agg.merge(reduceAll(r), reduceAll(l)) == whole, s"swapped split at $cut diverged")
    }
  }

  test("under-full buffers finish with their true count; empty finishes null") {
    assert(agg.finish(reduceAll(Seq("b", "a"))) == KmvResult(2, "b"))
    assert(agg.finish(agg.zero) == KmvResult(0, null))
  }
}
