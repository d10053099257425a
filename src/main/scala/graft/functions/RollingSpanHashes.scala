package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All stride-1 `span`-word window hashes of a token array in ONE O(n)
  * pass — the rolling (Rabin-Karp) polynomial hash the span family's
  * scaladoc promises for 100 TB (SURVEY §8: x27/x32/x39/x46; Lee et al.
  * exact-substring semantics at arbitrary span length).
  *
  * h(i) = Σ_{j<L} t(w_{i+j}) · B^{L-1-j}  mod 2^48, where t(w) is the
  * first 48 bits of md5(w). Each subsequent window updates in O(1):
  * h(i+1) = (h(i) − t(w_i)·B^{L-1})·B + t(w_{i+L}) — so a document costs
  * O(n_words) token hashes + O(n_words) updates, independent of the span
  * length, where the md5-of-joined-window form costs O(n_words · L). The
  * modulus is a POWER OF TWO on purpose: 2^48 divides 2^64, so plain
  * 64-bit wraparound followed by a mask is exact modular arithmetic — no
  * mulmod gymnastics — and the value stays under DuckDB's 48-bit-safe
  * BIGINT range (the oracle recomputes the same hash per window as an
  * exact HUGEINT power-weighted sum; congruence mod 2^48 makes the two
  * formulations equal). The base 8191 keeps the oracle's per-step
  * products inside BIGINT (2^48 · 2^13 < 2^63).
  *
  * Order-sensitive (positional weighting), unlike a multiset sum hash —
  * "a b" and "b a" never alias structurally. 48-bit birthday collisions
  * start mattering near ~2^24 DISTINCT windows per corpus; a collision
  * makes both engines agree on a false duplicate (the hash is the
  * contract), the standard fingerprint-dedup tradeoff.
  *
  * `eval`-only (CodegenFallback): the md5 per token dominates; a
  * generated loop would save nothing measurable.
  */
case class RollingSpanHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"$prettyName expects (ARRAY<STRING>, INT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    import RollingSpanHashes.{Base, Mask}
    val arr = l.asInstanceOf[ArrayData]
    val span = r.asInstanceOf[Int]
    require(span >= 1, s"$prettyName: span must be >= 1, got $span")
    val n = arr.numElements()
    if (n < span) new GenericArrayData(Array.empty[Long])
    else {
      val t = new Array[Long](n)
      var j = 0
      while (j < n) {
        t(j) = RollingSpanHashes.tokenHash(arr.getUTF8String(j))
        j += 1
      }
      var bl1 = 1L // B^(span-1) mod 2^48
      var e = 0
      while (e < span - 1) { bl1 = (bl1 * Base) & Mask; e += 1 }
      val out = new Array[Long](n - span + 1)
      var h = 0L
      j = 0
      while (j < span) { h = (h * Base + t(j)) & Mask; j += 1 }
      out(0) = h
      var i = 1
      while (i <= n - span) {
        h = (((h - ((t(i - 1) * bl1) & Mask)) & Mask) * Base + t(i + span - 1)) & Mask
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingSpanHashes =
    copy(left = newLeft, right = newRight)
}

object RollingSpanHashes {
  /** Rolling base: odd, small enough that the oracle's per-step
    * `acc·B + t` stays inside BIGINT (2^48 · 8191 < 2^63). */
  val Base = 8191L

  /** Modulus 2^48 as a mask — power of two so Long wraparound + mask is
    * exact modular arithmetic, and ≤48 bits so DuckDB BIGINT casts are
    * safe (the engine-wide hash-width discipline). */
  val Mask: Long = (1L << 48) - 1

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 48 bits (6 bytes / 12 hex chars) of md5 of the token's UTF-8
    * bytes — the same value the oracle's hex12-of-md5 fragment parses. */
  def tokenHash(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v
  }
}
