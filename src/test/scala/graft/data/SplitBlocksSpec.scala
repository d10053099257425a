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
    assert(rows.map(_.getLong(0)).toSeq.sorted === Seq(1L, 2L))
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

  test("x53 bridging append merges clusters as a unit (r13 ADVICE)") {
    // A later doc that is a near-dup of TWO previously-separate clusters
    // merges them; the merged component takes the SMALLER min-member id,
    // so the higher-id side is reassigned AS A UNIT to the surviving
    // cluster's split — the documented (and only) way an append can move
    // an existing assignment. Construction: A and B share a 19-word
    // prefix (jaccard ≈ 0.46, below the 0.5 edge threshold — separate
    // clusters), C = A ++ B is ≈ 0.69-jaccard to each (two edges).
    // The band collisions are md5-deterministic; these exact texts were
    // chosen by replaying the minhash/band math offline so both C-edges
    // collide in at least one of the 4 bands.
    import spark.implicits._
    val p = (1 to 19).map(i => s"p$i").mkString(" ")
    val aTxt = p + " " + (1 to 10).map(i => s"q0x$i").mkString(" ")
    val bTxt = p + " " + (1 to 10).map(i => s"r0x$i").mkString(" ")
    val filler = (2L to 40L).map(id =>
      (id, (1 to 25).map(i => s"u${id}x$i").mkString(" ")))
    val base = ((1L, aTxt) +: (51L, bTxt) +: filler).toDF("doc_id", "text")
    val before = TextOps.clusterSplit(base).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(4)))).toMap
    assert(before(1L)._1 === 1L, "A must start as its own cluster")
    assert(before(51L)._1 === 51L, "B must start as its own cluster")

    val appended = base.union(Seq((200L, aTxt + " " + bTxt))
      .toDF("doc_id", "text"))
    // vacuity guard: the bridge doc must actually edge to BOTH sides
    val pairs = TextOps.lshDupPairs(appended)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 200L)) && pairs.contains((51L, 200L)),
      s"bridge doc failed to edge to both clusters: $pairs")
    assert(!pairs.contains((1L, 51L)), "A-B edged directly — not a bridge")

    val after = TextOps.clusterSplit(appended).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(4)))).toMap
    // merged as a unit under the SURVIVING (smaller) cluster id = 1
    assert(after(1L)._1 === 1L && after(51L)._1 === 1L && after(200L)._1 === 1L)
    // the surviving side keeps its pre-append split; the merged side and
    // the bridge FOLLOW it (they may have moved — that is the documented
    // behavior, not a stability violation)
    assert(after(1L)._2 === before(1L)._2, "surviving cluster's split moved")
    assert(after(51L)._2 === after(1L)._2 && after(200L)._2 === after(1L)._2,
      "merged cluster must share one split")
    // every doc OUTSIDE the merged cluster is untouched
    filler.foreach { case (id, _) => assert(after(id) === before(id)) }
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
