package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Specs for the r13 additions: d15 block-level exact-substring dedup,
  * x53 cluster-safe splits, q35 co-occurrence lift, q36 Markov
  * transitions — each checked against a straight-line Scala reference on
  * randomized inputs, plus the structural properties the operators exist
  * to provide (x53's zero-leakage and append-stability, q36's total
  * order under timestamp ties).
  */
class SplitBlocksSpec extends AnyFunSuite {

  // Tables.session, NOT a bare builder (see FunnelSpec): the JVM-wide
  // session must carry GraftExtensions for concurrently-run suites
  private lazy val spark = Tables.session("split-blocks-spec", "4")

  // ---------------------------------------------------------------- d15

  /** Straight-line reference: position-aligned non-overlapping blocks,
    * multiset df over every (doc, position) occurrence. */
  private def blocksRef(docs: Seq[(Long, String)], bw: Int)
      : Map[Long, (Long, Long)] = {
    val all = docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      (0 until ws.length / bw).map(b =>
        (id, ws.slice(b * bw, b * bw + bw).mkString(" ")))
    }
    val df = all.groupBy(_._2).map { case (t, occ) => (t, occ.size) }
    all.groupBy(_._1).map { case (id, occ) =>
      (id, (occ.size.toLong, occ.count(o => df(o._2) > 1).toLong))
    }
  }

  test("d15 matches the multiset-block reference on a randomized corpus") {
    import spark.implicits._
    val rnd = new Random(13)
    val vocab = ('a' to 'p').map(_.toString)
    // half the docs embed one of 3 shared passages at a block boundary;
    // lengths straddle the 16-word cutoff to exercise the full-block rule
    val passages = (1 to 3).map(_ =>
      Seq.fill(16)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = (1L to 60L).map { id =>
      val own = Seq.fill(8 + rnd.nextInt(28))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      val text =
        if (id % 2 == 0) passages(rnd.nextInt(3)) + " " + own
        else own
      (id, text)
    }
    val got = TextOps.dedupExactBlocks(docs.toDF("doc_id", "text"))
      .select("doc_id", "n_blocks", "n_dup_blocks")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = blocksRef(docs, 16)
    assert(got === want)
    // non-vacuous: the shared passages must actually register as dups
    assert(want.values.map(_._2).sum > 0, "corpus produced no dup blocks")
  }

  test("d15 counts same-document passage repetition as duplication") {
    import spark.implicits._
    val p = (1 to 16).map(i => s"w$i").mkString(" ")
    val q = (17 to 32).map(i => s"w$i").mkString(" ")
    val rows = TextOps.dedupExactBlocks(Seq(
      (1L, p + " " + p), // self-repeat: both blocks dup
      (2L, q + " " + p), // block 1 unique, block 2 shared with doc 1
      (3L, "short doc under sixteen words stays out entirely"),
    ).toDF("doc_id", "text")).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(byId(1L) === ((2L, 2L, true)))
    assert(byId(2L) === ((2L, 1L, true)))
  }

  // ---------------------------------------------------------------- x53

  /** A corpus with engineered near-dup pairs: even ids duplicate the
    * preceding odd id's text with one word changed. */
  private def dupCorpus(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = ('a' to 'z').map(c => s"tok$c")
    (1L to n.toLong).map { id =>
      if (id % 2 == 0)
        (id, null) // placeholder, filled below from the odd sibling
      else
        (id, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.foldLeft(Vector.empty[(Long, String)]) { case (acc, (id, t)) =>
      if (t != null) acc :+ ((id, t))
      else acc :+ ((id, acc.last._2.replaceFirst("\\w+", "tokz")))
    }
  }

  test("x53 never splits a near-dup pair and is append-stable") {
    import spark.implicits._
    val docs = dupCorpus(120, seed = 7).toDF("doc_id", "text")
    val split = TextOps.clusterSplit(docs)
    val rows = split.collect()
    assert(rows.length === 120)
    assert(rows.forall(r => r.getLong(3) >= 0 && r.getLong(3) < 100))
    // the corpus has enough clusters that all three splits must appear
    assert(rows.map(_.getString(4)).distinct.sorted
      === Seq("test", "train", "val"))
    // zero leakage: both members of every dup pair share a split
    val bySplit = rows.map(r => r.getLong(0) -> r.getString(4)).toMap
    val pairs = TextOps.lshDupPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus produced no dup pairs — vacuous")
    pairs.foreach { case (a, b) =>
      assert(bySplit(a) === bySplit(b), s"pair ($a,$b) straddles splits")
    }
    // append-stability: adding later, unrelated docs never moves an
    // existing assignment (cluster ids are min-member, ids only grow)
    val extra = (121L to 160L).map(id =>
      (id, (1 to 25).map(i => s"u${id}x$i").mkString(" ")))
    val appended = TextOps.clusterSplit(
        docs.union(extra.toDF("doc_id", "text")))
      .filter(col("doc_id") <= 120)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(appended === bySplit)
  }

  // ----------------------------------------------------------- q35/q36

  private def randomEvents(seed: Int): Seq[(Long, String, Long, Long)] = {
    val rnd = new Random(seed)
    val types = Seq("view", "click", "purchase", "refund", "error")
    (1 to 400).map { i =>
      (1L + rnd.nextInt(20), types(rnd.nextInt(types.size)),
        // coarse timestamps force exact ties — the case the event_id
        // tie-break exists for
        1000L * rnd.nextInt(40), i.toLong)
    }
  }

  test("q35 lift matches the brute-force reference") {
    import spark.implicits._
    val ev = randomEvents(29)
    val df = ev.toDF("user_id", "event_type", "ts_us", "event_id")
    val got = RelationalQueries.cooccurrenceLift(df).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    val ue = ev.map(e => (e._1, e._2)).distinct
    val nUsers = ue.map(_._1).distinct.size.toLong
    val singles = ue.groupBy(_._2).map { case (t, s) => (t, s.size.toLong) }
    val want = ue.groupBy(_._1).values.flatMap { ts =>
      val sorted = ts.map(_._2).sorted
      for (a <- sorted; b <- sorted if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, occ) =>
      val nAb = occ.size.toLong
      (p, (nAb, singles(p._1), singles(p._2), nUsers,
        (nAb * nUsers).toDouble / (singles(p._1) * singles(p._2))))
    }
    assert(got === want)
  }

  test("q36 transitions match the ordered-walk reference under ts ties") {
    import spark.implicits._
    val ev = randomEvents(31)
    val df = ev.toDF("user_id", "event_type", "ts_us", "event_id")
    val got = RelationalQueries.eventTransitions(df).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val trans = ev.groupBy(_._1).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (e._3, e._4)).map(_._2)
      ordered.zip(ordered.drop(1))
    }.groupBy(identity).map { case (p, occ) => (p, occ.size.toLong) }
    val from = trans.groupBy(_._1._1).map { case (t, m) => (t, m.values.sum) }
    val want = trans.map { case (p, n) =>
      (p, (n, from(p._1), n.toDouble / from(p._1)))
    }
    assert(got === want)
  }
}
