package graft.data

import graft.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the positional-posting phrase matcher that the
  * corpus oracle exercises only incidentally: overlapping occurrences of
  * a repeated-term phrase, and the slot-count full-match rule.
  */
class PhraseSearchSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("phrase-search-spec", "4")
  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
  }

  test("repeated-term phrase counts every overlapping occurrence exactly once") {
    // "a a a a" contains "a a" at starts 1, 2, 3 — an adjacency join that
    // double-counts slots, or dedups starts wrongly, gets 6 or 1
    val out = TextOps.phraseSearch(docs(1L -> "a a a a"), Seq("a a"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a a", 1L, 3L, 1L)))
  }

  test("agrees with an in-memory sliding-window reference on random corpora") {
    // tiny vocabulary forces heavy term repetition and overlapping
    // matches — the regime where slot counting could silently miscount
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c")
    (1 to 5).foreach { trial =>
      val corpus = (0L until 20L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val phrases = Seq.fill(3)(
        Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" ")).distinct
      val expect = (for {
        p <- phrases; ts = p.split(' ').toSeq
        (id, t) <- corpus
        ws = t.split(' ').toSeq
        starts = ws.indices.filter(i => ws.slice(i, i + ts.size) == ts)
        if starts.nonEmpty
      } yield (p, id, starts.size.toLong, starts.min + 1L)).sorted
      val got = TextOps.phraseSearch(docs(corpus: _*), phrases).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      assert(got == expect, s"trial $trial diverged (phrases=$phrases)")
    }
  }

  test("a phrase matches only full slot coverage, never a partial prefix") {
    val d = docs(1L -> "x y z", 2L -> "x y q z", 3L -> "q x y z q")
    val out = TextOps.phraseSearch(d, Seq("x y z"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 2 has x y but not x y z contiguously; doc 3 matches at start 2
    assert(out.toSeq == Seq((1L, 1L, 1L), (3L, 1L, 2L)))
  }
}
