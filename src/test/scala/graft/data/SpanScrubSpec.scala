package graft.data

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

/** Randomized equivalence for the duplicated-span scrub: the distributed
  * x32 pipeline (shared window frame → dup table hash join → coverage
  * explode/dedupe → mark join → in-order reassembly) must agree with a
  * straight-line reference on corpora with PLANTED shared spans —
  * overlapping windows, spans at document edges, whole-doc duplicates,
  * and docs shorter than the window. */
class SpanScrubSpec extends AnyFunSuite {

  // Tables.session, NOT a bare builder: getOrCreate would otherwise let
  // this suite win the JVM-wide session race WITHOUT GraftExtensions,
  // breaking any concurrently-run suite that needs the native functions
  private lazy val spark = Tables.session("span-scrub-spec", "4")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Straight-line reference: same contract as TextOps.spanScrub. */
  private def reference(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val winText = (ws: Seq[String], i: Int) => ws.slice(i, i + k).mkString(" ")
    val dup = toks.flatMap { case (id, ws) =>
        if (ws.size >= k) (0 to ws.size - k).map(i => winText(ws, i) -> id) else Seq.empty
      }
      .groupBy(_._1).collect { case (w, xs) if xs.map(_._2).distinct.size >= 2 => w }
      .toSet
    toks.map { case (id, ws) =>
      val covered = mutable.Set.empty[Int]
      if (ws.size >= k)
        (0 to ws.size - k).foreach { i =>
          if (dup(winText(ws, i))) (i until i + k).foreach(covered += _)
        }
      val kept = ws.zipWithIndex.collect { case (w, p) if !covered(p) => w }
      id -> (ws.size.toLong, covered.size.toLong, md5hex(kept.mkString(" ")))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    TextOps.spanScrub(df, k)
      .select("doc_id", "n_tokens", "n_removed", "clean_md5")
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, r, m) => id -> (n, r, m) }.toMap
  }

  test("x32 scrub agrees with the in-memory reference on planted-span corpora") {
    val rnd = new Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (1 to 4).foreach { trial =>
      val k = 3 + rnd.nextInt(3) // window 3..5 words
      val planted = Vector.fill(2)(
        (0 until k + rnd.nextInt(3)).map(_ => vocab(rnd.nextInt(vocab.size))))
      val docs = (0L until 14L).map { id =>
        val base = (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
        val withSpan =
          if (id % 3 == 0) {
            // plant a shared span at a random position (sometimes the edge)
            val at = if (base.isEmpty) 0 else rnd.nextInt(base.size + 1)
            val (l, r) = base.splitAt(at)
            l ++ planted(rnd.nextInt(planted.size)) ++ r
          } else if (id == 7L && id - 1 >= 0) base // short/plain doc
          else base
        id -> withSpan.mkString(" ")
      } :+ (99L -> planted(0).mkString(" ")) :+ (100L -> planted(0).mkString(" ")) // whole-doc dups
      assert(run(docs, k) === reference(docs, k), s"trial $trial (k=$k)")
    }
  }

  test("x32 scrub agrees with the reference at arbitrary span lengths (rolling hash)") {
    // r9: the window hash is the O(1)-per-position rolling polynomial
    // (graft_span_hashes) — this pins the Lee-et-al exact-substring
    // semantics at ARBITRARY span length, including the degenerate k=1
    // (token-level dedup), a long k=16 window over docs that barely fit
    // it, and spans overlapping at a shared prefix (the rolling update's
    // subtract-then-shift step is exercised at every position).
    val rnd = new Random(41)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (k <- Seq(1, 2, 5, 9, 16)) {
      val planted = Vector.fill(3)(
        (0 until k + rnd.nextInt(4)).map(_ => vocab(rnd.nextInt(vocab.size))))
      val docs = (0L until 20L).map { id =>
        val base = (0 until rnd.nextInt(3 * k + 8)).map(_ => vocab(rnd.nextInt(vocab.size)))
        val withSpan =
          if (id % 2 == 0) {
            val at = if (base.isEmpty) 0 else rnd.nextInt(base.size + 1)
            val (l, r) = base.splitAt(at)
            l ++ planted(rnd.nextInt(planted.size)) ++ r
          } else base
        id -> withSpan.mkString(" ")
      } :+ (200L -> planted(1).mkString(" ")) :+ (201L -> planted(1).mkString(" "))
      assert(run(docs, k) === reference(docs, k), s"span length k=$k")
    }
  }
}
