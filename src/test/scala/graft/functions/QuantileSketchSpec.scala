package graft.functions

import graft.Tables
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable quantile sketch's contract:
  *
  *  1. the retained sample is a pure order statistic of (hash, value) —
  *     independent of arrival order, merge shape, and partitioning (the
  *     property that makes map-side partials deterministic);
  *  2. the DKW rank-error bound holds: for k = ln(2/δ)/(2ε²), every
  *     sample quantile's true rank is within ε·n of its target — pinned
  *     on three deterministic corpora of different shape;
  *  3. sub-k groups degenerate to the exact sorted value list;
  *  4. k misuse fails at ANALYSIS time, like a type error.
  */
class QuantileSketchSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("qsketch-spec", "4")

  /** splitmix64 — the deterministic stand-in for the engine's md5-derived
    * row hash (the sketch consumes any uniform BIGINT hash). */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def sketchOf(rows: Seq[(Long, Long)], k: Int): Seq[Long] = {
    val buf = new BottomKBuffer(k)
    rows.foreach { case (h, v) => buf.insert(h, v) }
    val out = java.util.Arrays.copyOfRange(buf.vs, 0, buf.n)
    java.util.Arrays.sort(out)
    out.toSeq
  }

  test("merge equals the whole, for any split and either order") {
    val rows = Seq.tabulate(500)(i => (mix(i.toLong), (i * 37 % 211).toLong))
    val whole = {
      val b = new BottomKBuffer(16)
      rows.foreach { case (h, v) => b.insert(h, v) }
      b
    }
    Seq(1, 7, 100, 250, 499).foreach { cut =>
      val (l, r) = rows.splitAt(cut)
      def reduce(xs: Seq[(Long, Long)]) = {
        val b = new BottomKBuffer(16)
        xs.foreach { case (h, v) => b.insert(h, v) }
        b
      }
      val m1 = reduce(l); m1.mergeFrom(reduce(r))
      val m2 = reduce(r); m2.mergeFrom(reduce(l))
      Seq(m1, m2).foreach { m =>
        assert(m.n == whole.n)
        assert(m.hs.take(m.n).toSeq == whole.hs.take(whole.n).toSeq, s"split $cut")
        assert(m.vs.take(m.n).toSeq == whole.vs.take(whole.n).toSeq, s"split $cut")
      }
    }
  }

  test("arrival order never matters") {
    val rows = Seq.tabulate(200)(i => (mix(i.toLong), i.toLong))
    val expected = sketchOf(rows, 8)
    val rng = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      assert(sketchOf(rng.shuffle(rows), 8) == expected)
    }
  }

  test("DKW rank-error bound on three corpus shapes") {
    val n = 20000
    val k = 1024
    // k >= ln(2/δ)/(2ε²) at δ = 1e-4 → ε = sqrt(ln(2e4)/(2k)) ≈ 0.0696;
    // deterministic hash ⇒ this either holds or not, no flake
    val eps = math.sqrt(math.log(2.0 / 1e-4) / (2.0 * k))
    val shapes: Seq[(String, Int => Long)] = Seq(
      ("uniform", i => (mix(i.toLong + 900001) % 1000003L).abs),
      ("zipf", i => 1000000L / (i % 1000 + 1)),
      ("constant-heavy", i => if (i % 5 != 0) 42L else i.toLong))
    shapes.foreach { case (label, gen) =>
      val values = Seq.tabulate(n)(gen)
      val rows = values.zipWithIndex.map { case (v, i) => (mix(i.toLong), v) }
      val sample = sketchOf(rows, k)
      val sortedAll = values.sorted.toIndexedSeq
      Seq(0.5, 0.9, 0.99).foreach { q =>
        val est = sample(math.ceil(q * sample.size).toInt - 1)
        // true rank range of est: [count(< est), count(<= est)]
        val lo = sortedAll.count(_ < est)
        val hi = sortedAll.count(_ <= est)
        val target = math.ceil(q * n)
        val err =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0.0
        assert(err <= eps * n,
          s"$label q=$q: rank err $err exceeds DKW bound ${eps * n}")
      }
    }
  }

  test("sub-k group degenerates to the exact sorted value list") {
    val rows = Seq.tabulate(10)(i => (mix(i.toLong), (9 - i).toLong))
    assert(sketchOf(rows, 64) == (0L to 9L).toSeq)
  }

  test("Spark: partitioning never changes the sketch") {
    import spark.implicits._
    val df = Seq.tabulate(3000)(i =>
      ((i % 4).toString, mix(i.toLong), (i * 131 % 977).toLong))
      .toDF("g", "hv", "v")
    def result(parts: Int) =
      df.repartition(parts).groupBy("g")
        .agg(expr("graft_qsketch(hv, v, 32)").as("s"))
        .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
        .toSeq
    val one = result(1)
    assert(result(7) == one)
    assert(result(32) == one)
  }

  test("k misuse is an analysis-time error") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3)).toDF("hv", "v", "kcol")
    intercept[AnalysisException] {
      df.selectExpr("graft_qsketch(hv, v, kcol)").collect()
    }
    intercept[AnalysisException] {
      df.selectExpr("graft_qsketch(hv, v, 0)").collect()
    }
    intercept[AnalysisException] {
      df.selectExpr("graft_qsketch(hv, CAST(v AS INT), 4)").collect()
    }
  }
}
