package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin must be row-identical to the brute-force theta join on any
  * input — randomized comparison plus the boundary cases the bucket
  * decomposition could get wrong.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("range-join-spec", "4")

  private def compare(pts: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)],
      bucketWidth: Long, keyed: Boolean): Unit = {
    import spark.implicits._
    val p = pts.toDF("k", "pt")
    val i = ivs.toDF("k", "s", "e")
    val keys = if (keyed) Seq("k") else Nil
    val fast = RangeJoin.pointInInterval(
        if (keyed) p else p.drop("k"), "pt",
        if (keyed) i else i.drop("k"), "s", "e", bucketWidth, keys)
      .select((keys.map(col) ++ Seq(col("pt"), col("s"), col("e"))): _*)
    val slow = (if (keyed) p.join(i, "k") else p.drop("k").crossJoin(i.drop("k")))
      .filter(col("s") <= col("pt") && col("pt") < col("e"))
      .select((keys.map(col) ++ Seq(col("pt"), col("s"), col("e"))): _*)
    assert(fast.count() == slow.count(),
      s"row counts diverge: ${fast.count()} vs ${slow.count()}")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "range join diverges from theta join")
  }

  test("randomized: bucketed join equals theta join, keyed and unkeyed") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
    // mixed interval lengths: sub-bucket, multi-bucket, and degenerate
    val ivs = Seq.fill(60) {
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(120) - 10)
    }
    compare(pts, ivs, bucketWidth = 32, keyed = true)
    compare(pts, ivs, bucketWidth = 32, keyed = false)
    compare(pts, ivs, bucketWidth = 1000, keyed = true) // one bucket total
    compare(pts, ivs, bucketWidth = 1, keyed = true) // bucket per unit
  }

  test("boundaries: start inclusive, end exclusive, bucket-edge points") {
    // interval [32, 64) with bucket width 32: points at 31/32/63/64 probe
    // both bucket edges and both inclusivity rules
    compare(
      pts = Seq((1L, 31L), (1L, 32L), (1L, 63L), (1L, 64L)),
      ivs = Seq((1L, 32L, 64L)),
      bucketWidth = 32, keyed = true)
  }

  test("degenerate and empty inputs match nothing without error") {
    import spark.implicits._
    val p = Seq((1L, 5L)).toDF("k", "pt")
    val empty = RangeJoin.pointInInterval(p, "pt",
      Seq((1L, 9L, 9L), (1L, 9L, 3L)).toDF("k", "s", "e"), "s", "e", 8, Seq("k"))
    assert(empty.count() == 0)
  }
}
