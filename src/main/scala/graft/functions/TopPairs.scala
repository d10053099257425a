package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded exact top-k per group as a typed `Aggregator` — the mergeable
  * shape that makes exact top-k-per-key viable over a pair stream that is
  * quadratic in the corpus (q32's all-pairs scan).
  *
  * A `row_number() OVER (PARTITION BY key ORDER BY score)` pre-filter
  * shuffles EVERY scored row into the window sort — at the 100× events
  * point that is a 4.5G-row (~10² GB) exchange for an output of 3 rows
  * per query, the shape that cannot survive scale-up (and the one this
  * round's 100× rehearsal run died on). An aggregation, by contrast, runs
  * MAP-SIDE partials: each grid task reduces its ≤budget pairs to at most
  * k rows per query it touched, so the shuffle carries
  * O(k · queries · factBlocks) rows — independent of pair volume.
  *
  * Ordering is (score DESC, id ASC) — exactly the window's
  * `ORDER BY cos DESC, user_id` tie rule, so the aggregate's output is
  * row-identical to the window form (spec + oracle pinned). Scores here
  * are the IEEE cosines both engines compute from the same integers;
  * `Double.compare` never sees a NaN (norms are positive by construction).
  *
  * Buffer is a sorted Vector capped at k: insert is O(k) per row with an
  * early reject for rows below the current kth (the common case once the
  * buffer fills — most of the 15M pairs in a full task cost ONE compare),
  * merge is the sorted-merge of two ≤k buffers.
  */
final case class TopPairRow(score: Double, id: Long, payload: Long)
final case class TopPairsBuf(rows: Vector[TopPairRow])
final case class TopPairsOut(rows: Seq[TopPairRow])

class TopPairsAggregator(k: Int)
    extends Aggregator[TopPairRow, TopPairsBuf, TopPairsOut] {

  /** (score DESC, id ASC) — the window tie rule. */
  private def before(a: TopPairRow, b: TopPairRow): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  def zero: TopPairsBuf = TopPairsBuf(Vector.empty)

  def reduce(b: TopPairsBuf, r: TopPairRow): TopPairsBuf = {
    if (b.rows.length == k && !before(r, b.rows.last)) return b
    val i = searchInsert(b.rows, r)
    TopPairsBuf(((b.rows.take(i) :+ r) ++ b.rows.drop(i)).take(k))
  }

  def merge(a: TopPairsBuf, b: TopPairsBuf): TopPairsBuf = {
    val out = Vector.newBuilder[TopPairRow]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.rows.length || j < b.rows.length)) {
      val next =
        if (j >= b.rows.length ||
          (i < a.rows.length && before(a.rows(i), b.rows(j)))) {
          val v = a.rows(i); i += 1; v
        } else { val v = b.rows(j); j += 1; v }
      out += next; n += 1
    }
    TopPairsBuf(out.result())
  }

  def finish(b: TopPairsBuf): TopPairsOut = TopPairsOut(b.rows)

  def bufferEncoder: Encoder[TopPairsBuf] = Encoders.product[TopPairsBuf]
  def outputEncoder: Encoder[TopPairsOut] = Encoders.product[TopPairsOut]

  private def searchInsert(v: Vector[TopPairRow], r: TopPairRow): Int = {
    var lo = 0; var hi = v.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(v(mid), r)) lo = mid + 1 else hi = mid
    }
    lo
  }
}
