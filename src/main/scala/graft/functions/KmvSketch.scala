package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed KMV (k-minimum-values) distinct-count sketch as a Spark
  * `Aggregator` — the mergeable-sketch aggregation shape: partial buffers
  * combine associatively, so Spark runs it with MAP-SIDE partials and the
  * shuffle carries one ≤k-element buffer per group per partition, not the
  * raw values. That is what makes per-group distinct estimation viable at
  * 100 TB where exact per-group distinct would shuffle every value.
  *
  * Determinism: the buffer is the SET of the k smallest md5-hex strings —
  * a pure function of the input set, independent of arrival or merge
  * order — so the emitted (k_actual, kth_hex) pair, and any estimate
  * derived from it, is bit-stable and oracle-checkable.
  */
final case class KmvBuf(hs: Vector[String])
final case class KmvResult(k_actual: Int, kth_hex: String)

class KmvAggregator(k: Int) extends Aggregator[String, KmvBuf, KmvResult] {

  def zero: KmvBuf = KmvBuf(Vector.empty)

  /** Insert keeping the buffer sorted, deduplicated, and capped at k. */
  def reduce(b: KmvBuf, h: String): KmvBuf = {
    if (h == null || (b.hs.length == k && b.hs.last <= h)) return b
    val i = searchInsert(b.hs, h)
    if (i < b.hs.length && b.hs(i) == h) b
    else KmvBuf(((b.hs.take(i) :+ h) ++ b.hs.drop(i)).take(k))
  }

  def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    // merge two sorted unique vectors, cap at k
    val out = Vector.newBuilder[String]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.hs.length || j < b.hs.length)) {
      val next =
        if (j >= b.hs.length || (i < a.hs.length && a.hs(i) <= b.hs(j))) {
          val v = a.hs(i); if (j < b.hs.length && b.hs(j) == v) j += 1; i += 1; v
        } else { val v = b.hs(j); j += 1; v }
      out += next; n += 1
    }
    KmvBuf(out.result())
  }

  def finish(b: KmvBuf): KmvResult =
    KmvResult(b.hs.length, if (b.hs.isEmpty) null else b.hs.last)

  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]

  private def searchInsert(v: Vector[String], h: String): Int = {
    var lo = 0; var hi = v.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }
}
