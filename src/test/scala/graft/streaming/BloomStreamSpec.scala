package graft.streaming

import graft.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming Bloom decontamination gate
  * ([[StreamingAnalytics.bloomDecontaminationStream]]) against its two
  * contracts (r11 VERDICT #3):
  *
  *  1. TWIN EQUALITY on the gate corpus: the stream's doc-local bitmask
  *     probe must flag exactly the docs the batch
  *     [[graft.data.TextOps.decontaminateBloom]] audit flags (same
  *     positions, same filter — so the batch audit's measured FPR IS the
  *     stream gate's FPR), and must be a SUPERSET of the exact x12
  *     verdict (no false negatives — the direction decontamination must
  *     never err in).
  *  2. SCALE ENGAGEMENT: a synthetic 10⁵-shingle benchmark — the size
  *     that breaks the exact hash-list literal — ships as a fixed
  *     mBits/64-long bitmask; planted contamination is caught, the
  *     measured doc-level FPR at m = 2²³ stays small, and the literal's
  *     size is a function of m alone, not of the benchmark.
  */
class BloomStreamSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("bloom-stream-spec", "4")

  test("stream bloom verdicts equal batch x52 and superset the exact x12 flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)

    val batch = graft.data.TextOps.decontaminateBloom(docs)
      .select("doc_id", "n_sh", "n_bloom_hits", "bloom_contaminated",
        "exact_contaminated")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(batch.values.exists(_._3) && batch.values.exists(!_._3),
      "batch bloom verdict is vacuous on the gate corpus")

    val bits = graft.data.TextOps.benchBloomBits(docs)
    assert(bits.size == 4096 / 64)

    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamingAnalytics.bloomDecontaminationStream(
        input.toDF().toDF("doc_id", "text"), bits)
      .writeStream.format("memory").queryName("bloomstream")
      .outputMode("append").start()
    val (w1, w2) = rows.splitAt(rows.size / 3) // deliberately uneven waves
    input.addData(w1); q.processAllAvailable()
    input.addData(w2); q.processAllAvailable()

    val got = spark.table("bloomstream").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    q.stop()
    assert(got.size == rows.size, "one verdict per arriving doc")
    // batch x52 reports only non-bench docs with >= 3 words; on those the
    // stream must agree hit-for-hit (not just flag-for-flag)
    batch.foreach { case (id, (nSh, nHits, bloom, exact)) =>
      val (gSh, gHits, gFlag) = got(id)
      assert((gSh, gHits, gFlag) == ((nSh, nHits, bloom)),
        s"doc $id diverged: stream=($gSh,$gHits,$gFlag) batch=($nSh,$nHits,$bloom)")
      assert(!exact || gFlag, s"doc $id: exact-contaminated but bloom-admitted")
    }
    // bench docs flag by id even though the batch audit excludes them
    got.filter(_._1 < 10).values.foreach { case (_, _, flag) => assert(flag) }
  }

  test("a 100k-shingle synthetic benchmark engages at fixed literal size with small doc-level FPR") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mBits = 1 << 23 // sized for a sub-1% doc-level FPR at 1e5 shingles
    // 10 bench docs x 10,002 distinct tokens => 1e5 distinct trigram
    // shingles — the eval-suite size where the exact hash-list literal
    // stops being shippable
    val benchDocs = (0 until 10).map { d =>
      (d.toLong, (0 until 10002).map(i => s"b${d}_$i").mkString(" "))
    }
    val bits = graft.data.TextOps.benchBloomBits(
      benchDocs.toDF("doc_id", "text"), mBits = mBits)
    assert(bits.size == mBits / 64, "literal size must be a function of m alone")
    val nSet = bits.map(java.lang.Long.bitCount(_).toLong).sum
    assert(nSet > 250000L, s"only $nSet bits set — the benchmark didn't load")

    // training side: 2 planted docs carry one bench trigram each; 20
    // clean docs draw from a disjoint token space
    val rnd = new scala.util.Random(0xB10)
    val planted = Seq(
      (100L, "c x y " + "b3_17 b3_18 b3_19" + " z w v q r s t u a b c d e f g h"),
      (101L, (1 to 30).map(i => s"c$i").mkString(" ") + " b7_9000 b7_9001 b7_9002"))
    val clean = (110L until 130L).map { id =>
      (id, (1 to 60).map(_ => s"c${rnd.nextInt(5000)}").mkString(" "))
    }
    val input = MemoryStream[(Long, String)]
    val q = StreamingAnalytics.bloomDecontaminationStream(
        input.toDF().toDF("doc_id", "text"), bits)
      .writeStream.format("memory").queryName("bloomsynth")
      .outputMode("append").start()
    input.addData(planted ++ clean)
    q.processAllAvailable()
    val got = spark.table("bloomsynth").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    q.stop()
    assert(got(100L) && got(101L), "planted bench trigrams were not caught")
    val falsePos = clean.count { case (id, _) => got(id) }
    assert(falsePos <= 2,
      s"$falsePos of ${clean.size} clean docs false-flagged at m = 2^23")
  }
}
