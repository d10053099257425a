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

  // ---- d10 (r14: est_matches rides the candidate spine) ---------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Straight-line d10 reference: shingles → 12 keyed-md5 minima → 4×3
    * band keys → band-collision candidate pairs → per-pair signature
    * match count + exact shingle jaccard. Mirrors TextOps exactly:
    * lexicographic min over lowercase hex == Spark's UTF8String min. */
  private def referenceCalibration(docs: Seq[(Long, String)])
      : Map[(Long, Long), (Long, Double, Long, Long, Long, Double, Double)] = {
    val sh: Map[Long, Set[String]] = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      id -> (if (ws.length < 3) Set.empty[String]
             else (1 to ws.length - 2).map(i =>
               s"${ws(i - 1)} ${ws(i)} ${ws(i + 1)}").toSet)
    }.toMap
    val withSh = sh.filter(_._2.nonEmpty)
    val mh: Map[Long, IndexedSeq[String]] = withSh.map { case (id, s) =>
      id -> (1 to 12).map(i => s.map(x => md5hex(s"$i:$x")).min)
    }
    val bands: Map[Long, IndexedSeq[(Int, String)]] = mh.map { case (id, h) =>
      id -> (0 until 4).map(b =>
        b -> md5hex((0 until 3).map(r => h(b * 3 + r)).mkString("|")))
    }
    val ids = bands.keys.toSeq.sorted
    val out = for {
      ai <- ids.indices; bi <- (ai + 1) until ids.size
      a = ids(ai); b = ids(bi)
      if bands(a).exists { case (bd, sig) => bands(b).contains((bd, sig)) }
      common = (sh(a) intersect sh(b)).size.toLong
      if common > 0 // inner verification join: zero-overlap pairs drop out
    } yield {
      val est = (0 until 12).count(i => mh(a)(i) == mh(b)(i)).toLong
      val (sa, sb) = (sh(a).size.toLong, sh(b).size.toLong)
      val jac = common.toDouble / (sa + sb - common)
      (a, b) -> ((est, est.toDouble / 12, common, sa, sb, jac, est.toDouble / 12 - jac))
    }
    out.toMap
  }

  test("d10 calibration agrees with the in-memory reference on planted near-dup corpora") {
    import spark.implicits._
    val rnd = new Random(0xD10)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 3).foreach { trial =>
      val base = Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      val docs = (0L until 16L).map { id =>
        val text =
          if (id % 4 == 0) base.mkString(" ") // exact dups: est = 12
          else if (id % 4 == 1) // near dup: one word perturbed
            base.updated(rnd.nextInt(base.size), vocab(rnd.nextInt(vocab.size))).mkString(" ")
          else if (id == 7L) vocab(rnd.nextInt(vocab.size)) // sub-shingle doc
          else Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (id, text)
      }
      val want = referenceCalibration(docs)
      val got = TextOps.minhashCalibration(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getDouble(7), r.getDouble(8))))
        .toMap
      assert(got == want, s"trial $trial diverged on ${
        got.keySet.union(want.keySet).filter(k => got.get(k) != want.get(k))}")
      assert(want.nonEmpty, s"trial $trial degenerate: no candidate pairs")
      assert(want.values.exists(_._1 == 12L), s"trial $trial: no exact-dup pair")
    }
  }

  test("d10 sampling commutes with the candidate dedup (filter-below-distinct, r14)") {
    import spark.implicits._
    val rnd = new Random(0xD10b)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val base = Seq.fill(14)(vocab(rnd.nextInt(vocab.size)))
    val docs = (0L until 12L).map { id =>
      (id, if (id % 2 == 0) base.mkString(" ")
           else base.updated(id.toInt % base.size, vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val full = TextOps.minhashCalibration(docs, sampleOneIn = 1)
    // the sampled output must equal the full output filtered by the SAME
    // deterministic pair-hash rule — i.e. sampling before the dedup
    // exchange selects exactly the pairs sampling after it would
    val wantRows = full.filter(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("doc_a"),
            org.apache.spark.sql.functions.col("doc_b")),
          org.apache.spark.sql.functions.lit(3)) === 0)
      .collect().toSet
    val gotRows = TextOps.minhashCalibration(docs, sampleOneIn = 3).collect().toSet
    assert(gotRows == wantRows)
  }

  // ---- x29 (r14: single-pass BM25 with conditional per-term tf) -------

  /** Straight-line x29 reference replicating the quantized expression
    * shapes exactly (same IEEE evaluation order as the Spark SQL text). */
  private def referenceBm25(docs: Seq[(Long, String)], terms: Seq[String], k: Int)
      : Seq[(Int, Long, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val nDocs = docs.size.toLong
    val sumDl = toks.map(_._2.size.toLong).sum
    val tf: Map[Long, Map[String, Long]] = toks.map { case (id, ws) =>
      id -> terms.map(t => t -> ws.count(_ == t).toLong).filter(_._2 > 0).toMap
    }.toMap
    val df: Map[String, Long] = terms.map(t =>
      t -> tf.values.count(_.contains(t)).toLong).toMap
    val idfQ: Map[String, Long] = terms.map { t =>
      t -> math.floor(math.log(1.0 + ((nDocs - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5))
        * 1048576.0).toLong
    }.toMap
    val scored = toks.collect { case (id, ws) if tf(id).nonEmpty =>
      val dl = ws.size.toLong
      val scoreQ = tf(id).map { case (t, f) =>
        math.floor(idfQ(t).toDouble * (f.toDouble * 2.2)
          / (f.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / (sumDl.toDouble / nDocs)))).toLong
      }.sum
      (id, tf(id).size.toLong, scoreQ)
    }
    scored.sortBy { case (id, _, s) => (-s, id) }.take(k).zipWithIndex.map {
      case ((id, nt, s), i) => (i + 1, id, nt, s, s.toDouble / 1048576.0)
    }
  }

  test("x29 BM25 agrees with the in-memory reference on random corpora, arbitrary terms") {
    import spark.implicits._
    val rnd = new Random(0x29B)
    // a quote-bearing term pins the literal-safety path (Column API, no
    // SQL interpolation of term text)
    val termSets = Seq(Seq("aa", "bb", "cc", "dd"), Seq("a'b", "ee", "zz-not-present"))
    for (terms <- termSets; k <- Seq(2, 5)) {
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "a'b")
      val docs = (0L until 25L).map { id =>
        val n = 1 + rnd.nextInt(30)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val want = referenceBm25(docs, terms, k)
      val got = TextOps.bm25TopK(docs.toDF("doc_id", "text"), terms, k)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSeq
      assert(got == want, s"terms=$terms k=$k:\n got=$got\nwant=$want")
      assert(want.nonEmpty, s"terms=$terms degenerate: no matching docs")
    }
  }
}
