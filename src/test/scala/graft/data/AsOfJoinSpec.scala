package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin.lastBefore must equal the brute-force "greatest right ≤ left"
  * on any input — randomized comparison across bucket widths plus the
  * cases the bucket carry-forward could get wrong (gaps spanning many
  * empty buckets, ties, no-predecessor rows).
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("asof-join-spec", "4")

  private def compare(lefts: Seq[(Long, Long, Long)], rights: Seq[(Long, Long, Long)],
      bucketUs: Long, keyed: Boolean): Unit = {
    import spark.implicits._
    val l = lefts.toDF("k", "id", "ts")
    val r = rights.toDF("k", "rts", "rval")
    val keys = if (keyed) Seq("k") else Nil
    val fast = AsOfJoin.lastBefore(
        if (keyed) l else l.drop("k"), "id", "ts",
        if (keyed) r else r.drop("k"), "rts", "rval", bucketUs, keys)
      .select("id", "asof_ts", "asof_val")
    // the r14 fold-through-agg path must be row-identical to the
    // join-back path on every case this spec covers
    val folded = AsOfJoin.lastBefore(
        if (keyed) l else l.drop("k"), "id", "ts",
        if (keyed) r else r.drop("k"), "rts", "rval", bucketUs, keys,
        foldLeft = true)
      .select("id", "asof_ts", "asof_val")
    assert(fast.exceptAll(folded).isEmpty && folded.exceptAll(fast).isEmpty,
      "foldLeft path diverges from join-back path")
    val slow = (if (keyed) l.join(r, "k") else l.drop("k").crossJoin(r.drop("k")))
      .withColumn("__c", when(col("rts") <= col("ts"), struct(col("rts"), col("rval"))))
      .groupBy("id").agg(max("__c").as("__m"))
      .select(col("id"), col("__m.rts").as("asof_ts"), col("__m.rval").as("asof_val"))
    // every left id appears in both (fast keeps lefts with no predecessor
    // as nulls; slow's groupBy over the join product does too)
    assert(fast.count() == lefts.size && slow.count() == lefts.size)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "as-of join diverges from brute force")
  }

  test("randomized: bucketed as-of equals brute force across bucket widths") {
    val rnd = new scala.util.Random(11)
    val lefts = Seq.tabulate(300)(i =>
      (rnd.nextInt(3).toLong, i.toLong, rnd.nextInt(10000).toLong))
    // sparse rights: long empty-bucket gaps are the carry-forward case;
    // duplicate rts values exercise the max-val tie rule
    val rights = Seq.fill(40) {
      val ts = rnd.nextInt(10) * 1000L + rnd.nextInt(3)
      (rnd.nextInt(3).toLong, ts, rnd.nextInt(100).toLong)
    }
    compare(lefts, rights, bucketUs = 64, keyed = true)
    compare(lefts, rights, bucketUs = 64, keyed = false)
    compare(lefts, rights, bucketUs = 1, keyed = true)
    compare(lefts, rights, bucketUs = 100000, keyed = true) // single bucket
  }

  test("no predecessor yields nulls; exact-timestamp match is inclusive") {
    compare(
      lefts = Seq((1L, 1L, 5L), (1L, 2L, 100L), (1L, 3L, 99L)),
      rights = Seq((1L, 100L, 7L), (1L, 200L, 8L)),
      bucketUs = 64, keyed = true)
  }
}
