package graft.data

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

/** Randomized equivalence for the BPE trainer: the distributed loop
  * (vocab agg → argmax → `aggregate`-HOF merge fold) must agree with a
  * straight-line in-memory reference on arbitrary corpora — most
  * importantly on shared-delimiter runs (`aaaa` with top pair (a,a)),
  * where greedy left-to-right application merges floor(k/2) pairs and a
  * naive string replace would not.
  */
class BpeMergesSpec extends AnyFunSuite {

  // Tables.session, NOT a bare builder: getOrCreate would otherwise let
  // this suite win the JVM-wide session race WITHOUT GraftExtensions,
  // breaking any concurrently-run suite that needs the native functions
  private lazy val spark = Tables.session("bpe-merges-spec", "4")

  /** Straight-line reference: same contract as TextOps.bpeMerges. */
  private def reference(texts: Seq[String], rounds: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab: Seq[(Seq[String], Long)] = texts.flatMap(_.split(" ", -1))
      .groupBy(identity).toSeq
      .map { case (w, xs) => w.map(_.toString) -> xs.size.toLong }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (ss, c) =>
        ss.iterator.sliding(2).withPartial(false).foreach { p =>
          counts((p.head, p(1))) += c
        }
      }
      if (counts.nonEmpty) {
        val ((pa, pb), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r, pa, pb, pa + pb, c))
        vocab = vocab.map { case (ss, cnt) =>
          val buf = mutable.ArrayBuffer.empty[String]
          ss.foreach { x =>
            if (buf.nonEmpty && buf.last == pa && x == pb) buf(buf.size - 1) = pa + pb
            else buf += x
          }
          buf.toSeq -> cnt
        }
      }
    }
    out.result()
  }

  private def run(texts: Seq[String], rounds: Int): Seq[(Int, String, String, String, Long)] = {
    import spark.implicits._
    val df = texts.toDF("text")
    TextOps.bpeMerges(df, rounds)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
  }

  test("overlap chains: runs of a repeated symbol merge greedily, not replace-style") {
    // 'aaaa' = a a a a: after merging (a,a) it must become [aa, aa], so
    // round 2's pair counts see (aa, aa) — the case where non-overlapping
    // string replace (which skips the shared delimiter) diverges.
    val texts = Seq(
      "aaaa aaaa aaaa aab",
      "aaaa aaa ab",
      "aaaa aab aaa")
    assert(run(texts, 4) === reference(texts, 4))
  }

  test("bpe merge table agrees with the in-memory reference on random corpora") {
    val rnd = new Random(7)
    (1 to 4).foreach { trial =>
      val alphabet = "ab" + ("cdef".take(rnd.nextInt(4)))
      val words = Vector.fill(6 + rnd.nextInt(6)) {
        (0 until 1 + rnd.nextInt(7)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val texts = Vector.fill(15)(
        (0 until 3 + rnd.nextInt(10)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
      val rounds = 3 + rnd.nextInt(4)
      assert(run(texts, rounds) === reference(texts, rounds), s"trial $trial")
    }
  }
}
