package graft.data

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized equivalence for the boilerplate-line remover: the
  * distributed x22 pipeline (explode → df agg → broadcast join →
  * per-doc reassembly) must agree with a straight-line in-memory
  * reference implementation on arbitrary corpora — including the edge
  * shapes the fixed oracle corpus can't cover (every line boilerplate,
  * single-word docs, duplicate lines WITHIN one document).
  */
class TextOpsPropertySpec extends AnyFunSuite {

  test("CMS audit: estimates upper-bound exact counts on random corpora, tight when under-loaded") {
    val sp = Tables.session("textops-property-spec", "4")
    import sp.implicits._
    val rnd = new Random(0xC35)
    for (round <- 1 to 3) {
      val vocab = (1 to 30 + rnd.nextInt(200)).map(i => s"t$i")
      val docs = (1 to 10).map { id =>
        (id.toLong, (1 to 100).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val out = TextOps.cmsAudit(docs).collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val (exact, est) = (r.getLong(2), r.getLong(3))
        assert(est >= exact,
          s"round $round: CMS under-estimated '${r.getString(1)}' ($est < $exact) — impossible for a correct CMS")
      }
    }
  }

  // Tables.session, NOT a bare builder: getOrCreate would otherwise let
  // this suite win the JVM-wide session race WITHOUT GraftExtensions,
  // breaking any concurrently-run suite that needs the native functions
  private lazy val spark = Tables.session("textops-property-spec", "4")

  test("Bloom decontamination never false-negatives on random corpora, at any filter size") {
    import spark.implicits._
    val rnd = new Random(0xB100)
    for ((mBits, round) <- Seq(256, 1024, 8192).zipWithIndex) {
      // small vocab => heavy bench/training shingle overlap by chance;
      // tiny m => heavy hash collision pressure — both directions stress
      // the one property that must hold: exact contamination implies a
      // bloom flag (a member's positions are all set, always)
      val vocab = (1 to 20 + rnd.nextInt(40)).map(i => s"w$i")
      val docs = (0L until 40L).map { id =>
        (id, (1 to 5 + rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val out = TextOps.decontaminateBloom(docs, mBits = mBits).collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val (bloom, exact) = (r.getBoolean(3), r.getBoolean(4))
        assert(!exact || bloom,
          s"round $round m=$mBits: doc ${r.getLong(0)} exact-contaminated " +
            "but bloom-admitted — impossible for a correct Bloom filter")
      }
    }
  }

  test("seeded operators reject a seed that would escape its SQL literal (ADVICE r11)") {
    import spark.implicits._
    val docs = Seq((1L, "src", "a b c d")).toDF("doc_id", "source", "text")
    // the seed is spliced into md5(concat('<seed>:...')) expression text;
    // a quote would break parsing or rewrite the expression — all five
    // splice sites must refuse at plan-build time, before any action
    for (bad <- Seq("x'); drop --", "a'b", "")) {
      intercept[IllegalArgumentException](TextOps.shardExport(docs, seed = bad))
      intercept[IllegalArgumentException](TextOps.budgetCap(docs, seed = bad))
      intercept[IllegalArgumentException](TextOps.mixtureExpand(docs, seed = bad))
      intercept[IllegalArgumentException](TextOps.importanceResample(docs, seed = bad))
    }
    // the documented alphabet passes (and is what every default uses)
    assert(TextOps.shardExport(docs, seed = "graft_r12-A9").columns.contains("shard"))
  }

  private val LineWords = 8
  private val MinDf = 2

  /** Straight-line reference: same contract as TextOps.boilerplateLines. */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    def linesOf(text: String): Seq[String] =
      text.split(" ", -1).grouped(LineWords).map(_.mkString(" ")).toSeq
    val df = docs.flatMap { case (id, t) => linesOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size.toLong }
    val boiler = df.filter(_._2 >= MinDf).keySet
    docs.map { case (id, t) =>
      val ls = linesOf(t)
      val kept = ls.filterNot(boiler.contains)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> (ls.size.toLong, (ls.size - kept.size).toLong, md)
    }.toMap
  }

  test("x22 agrees with the in-memory reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    (1 to 5).foreach { trial =>
      val nDocs = 20 + rnd.nextInt(30)
      val boilerLine = Seq.fill(LineWords)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val docs = (0L until nDocs).map { id =>
        val nWords = 1 + rnd.nextInt(40)
        val words = Seq.fill(nWords)(vocab(rnd.nextInt(vocab.size)))
        // a third of docs get the shared boilerplate line injected at a
        // line boundary; some docs repeat their own first line (in-doc dup)
        val text =
          if (id % 3 == 0) (boilerLine.split(" ") ++ words).mkString(" ")
          else if (id % 7 == 0 && nWords >= LineWords)
            (words.take(LineWords) ++ words.take(LineWords) ++ words).mkString(" ")
          else words.mkString(" ")
        (id, text)
      }
      val want = reference(docs)
      val got = TextOps.boilerplateLines(
          docs.toDF("doc_id", "text"), LineWords, MinDf)
        .select("doc_id", "n_lines", "n_boiler", "clean_md5")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == want, s"trial $trial: diverged on ${
        got.keySet.union(want.keySet).filter(k => got.get(k) != want.get(k))}")
    }
  }

  private val SpanWords = 4 // small span so random docs actually collide

  /** Straight-line reference for x27 (same contract, parameterized span). */
  private def referenceSpans(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def winsOf(text: String): Seq[String] = {
      val ws = text.split(" ", -1)
      if (ws.length < SpanWords) Seq.empty
      else (0 to ws.length - SpanWords).map(i => ws.slice(i, i + SpanWords).mkString(" "))
    }
    val docsPerWin = docs.flatMap { case (id, t) => winsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
    val dup = docsPerWin.filter(_._2 >= 2).keySet
    docs.map { case (id, t) =>
      val ws = winsOf(t)
      id -> (ws.size.toLong, ws.count(dup.contains).toLong)
    }.toMap
  }

  test("x27 agrees with the in-memory reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(7)
    val vocab = Vector("a", "b", "c")
    (1 to 5).foreach { trial =>
      val nDocs = 15 + rnd.nextInt(20)
      val docs = (0L until nDocs).map { id =>
        val nWords = 1 + rnd.nextInt(20) // some docs shorter than a span
        (id, Seq.fill(nWords)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val want = referenceSpans(docs)
      val got = TextOps.duplicatedSpans(docs.toDF("doc_id", "text"), SpanWords)
        .select("doc_id", "n_windows", "n_dup")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want, s"trial $trial: diverged on ${
        got.keySet.union(want.keySet).filter(k => got.get(k) != want.get(k))}")
      assert(want.values.exists(_._2 > 0), s"trial $trial degenerate: no dup spans")
    }
  }
}
