package graft.functions

import java.nio.ByteBuffer
import java.util.Arrays

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Mutable bottom-k buffer over (hash, value) pairs, ordered ascending by
  * (hash, value): the k rows with the SMALLEST hashes — a deterministic
  * uniform k-sample of the rows when the hash is a good hash of a unique
  * row key. Insert is O(k) with an O(1) reject once full (the common
  * case: past the first k rows of a partition almost every row fails the
  * `h >= last` test with one compare). */
final class BottomKBuffer(val k: Int) {
  var n: Int = 0
  val hs = new Array[Long](k)
  val vs = new Array[Long](k)

  @inline private def before(h: Long, v: Long, i: Int): Boolean =
    h < hs(i) || (h == hs(i) && v < vs(i))

  def insert(h: Long, v: Long): Unit = {
    if (n == k && !before(h, v, n - 1)) return
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(h, v, mid)) hi = mid else lo = mid + 1
    }
    val last = math.min(n, k - 1)
    var i = last
    while (i > lo) { hs(i) = hs(i - 1); vs(i) = vs(i - 1); i -= 1 }
    if (lo < k) { hs(lo) = h; vs(lo) = v }
    if (n < k) n += 1
  }

  /** Two-pointer merge of two (hash, value)-sorted buffers, keeping the
    * smallest min(k, n + o.n) — O(n + o.n), not o.n inserts of O(k) each
    * (at the documented k = 16384 operating point an insert-based merge
    * would do ~k²/2 element shifts per combine). Ties carry identical
    * (h, v) pairs, so take-left keeps the result deterministic. */
  def mergeFrom(o: BottomKBuffer): Unit = {
    if (o.n == 0) return
    if (n == 0) {
      System.arraycopy(o.hs, 0, hs, 0, o.n)
      System.arraycopy(o.vs, 0, vs, 0, o.n)
      n = o.n
      return
    }
    val m = math.min(k, n + o.n)
    val nh = new Array[Long](m); val nv = new Array[Long](m)
    var i = 0; var j = 0; var t = 0
    while (t < m) {
      val takeLeft = j >= o.n || (i < n &&
        (hs(i) < o.hs(j) || (hs(i) == o.hs(j) && vs(i) <= o.vs(j))))
      if (takeLeft) { nh(t) = hs(i); nv(t) = vs(i); i += 1 }
      else { nh(t) = o.hs(j); nv(t) = o.vs(j); j += 1 }
      t += 1
    }
    System.arraycopy(nh, 0, hs, 0, m)
    System.arraycopy(nv, 0, vs, 0, m)
    n = m
  }
}

/** Mergeable quantile sketch — `graft_qsketch(hash, value, k)` →
  * ARRAY<BIGINT>: the values of the k rows with the smallest hashes,
  * sorted ASCENDING BY VALUE, ready for rank selection
  * (`element_at(sample, ceil(q·size))` is the q-quantile estimate).
  *
  * This is the bottom-k (KMV-structured) SAMPLING quantile sketch: with
  * `hash` a uniform hash of a unique row key, the retained rows are a
  * uniform simple random sample of size k, so the sample's empirical CDF
  * approximates the group's with rank error ε at confidence 1−δ for
  * k ≥ ln(2/δ)/(2ε²) (Dvoretzky–Kiefer–Wolfowitz) — INDEPENDENT of group
  * size, the property that makes per-source value distributions (data-
  * card length/score percentiles) viable at 100 TB where x8's exact
  * histogram selection needs a bounded value range. Mergeable exactly
  * (bottom-k of a union = bottom-k of bottom-k's), so map-side partials
  * shuffle ≤k values per (group, partition) — never the data.
  *
  * Design choice vs KLL/t-digest: a KLL compactor reaches the same ε in
  * O((1/ε)·√log(1/δ)) space vs this sketch's O(1/ε²) — but its random
  * (or pseudo-random) compaction decisions make the retained set depend
  * on partitioning/merge order, which the engine's correctness gate
  * (bit-identical replay against a SQL oracle) forbids. The bottom-k
  * sample is a pure order statistic of a deterministic hash: any engine
  * can replay it from the same md5, merge order cannot change it, and a
  * finer sketch (larger k) on the same hash always retains a superset of
  * a coarser one (nested, like x11's stratified sample). At the data-card
  * operating point (ε ≈ 1.5%, δ = 10⁻⁴ → k = 16384 ≈ 128 KB/group) the
  * space price is acceptable; sub-k groups degenerate to the EXACT
  * sorted value list.
  *
  * Ties: ordered by (hash, value) — deterministic even under hash
  * collisions. Nulls in either argument skip the row (SQL agg behavior).
  */
case class QuantileSketch(
    hash: Expression, value: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def prettyName: String = "graft_qsketch"
  override def children: Seq[Expression] = Seq(hash, value, kExpr)
  override def checkInputDataTypes(): TypeCheckResult = {
    val want = Seq(LongType, LongType, IntegerType)
    val got = children.map(_.dataType)
    if (got != want) TypeCheckResult.TypeCheckFailure(
      s"graft_qsketch expects (BIGINT, BIGINT, INT), got $got")
    else if (!kExpr.foldable) TypeCheckResult.TypeCheckFailure(
      "graft_qsketch: k must be a literal")
    else if (kExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("graft_qsketch: k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      buf.insert(h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: BottomKBuffer): Any = {
    val out = Arrays.copyOfRange(buf.vs, 0, buf.n)
    Arrays.sort(out)
    new GenericArrayData(out): ArrayData
  }

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k); bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.hs(i)); bb.putLong(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BottomKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.hs(i) = bb.getLong(); buf.vs(i) = bb.getLong(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(hash = newChildren(0), value = newChildren(1), kExpr = newChildren(2))
}
