package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-filter probe counter — the hot loop of the streaming
  * decontamination gate
  * ([[graft.streaming.StreamingAnalytics.bloomDecontaminationStream]],
  * SURVEY §8 x52): per input shingle, kHash portable positions
  * (hex13(md5(j ':' sh)) mod mBits — BIT-IDENTICAL to the SQL fragment
  * the batch audit and the DuckDB oracle compute), counted iff EVERY
  * position's bit is set in the filter literal.
  *
  * The SQL higher-order-function formulation evaluates, per shingle per
  * hash, an interpreted lambda tree: a concat building a UTF8String, an
  * md5 returning 32 hex chars, then THIRTEEN substring+instr expression
  * evaluations to parse hex13 back into a number, then element_at +
  * shift arithmetic — all outside codegen. This expression runs the
  * identical math as one tight loop: the md5 digest bytes ARE the
  * number (first 13 hex chars = first 52 bits big-endian), no hex
  * round-trip, no per-element expression trees, the filter words a
  * plain long[] probed by index. The md5 itself is untouched, so the
  * result is replayable by any engine that can express the SQL form.
  *
  * `eval`-only (CodegenFallback, the [[RollingSpanHashes]] precedent):
  * the k md5 digests per shingle dominate; a generated loop would save
  * nothing measurable beyond what dropping the lambda machinery saves.
  *
  * Arguments: (shingles ARRAY<STRING>, bits ARRAY<BIGINT> FOLDABLE,
  * kHash INT foldable ≥ 1, mBits INT foldable = 64 · size(bits)).
  * The bits literal is validated and materialized ONCE at first use;
  * null shingle elements never count (the SQL filter's null semantics).
  */
case class BloomHits(shingles: Expression, bits: Expression,
    kHash: Expression, mBits: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(shingles, bits, kHash, mBits)
  override def nullable: Boolean = shingles.nullable
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bloom_hits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (shingles.dataType, bits.dataType, kHash.dataType, mBits.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _), IntegerType, IntegerType) =>
        if (!bits.foldable || !kHash.foldable || !mBits.foldable)
          TypeCheckFailure(s"$prettyName: bits, kHash and mBits must be literals")
        else {
          val k = kHash.eval().asInstanceOf[Number].intValue()
          val m = mBits.eval().asInstanceOf[Number].intValue()
          val bitsArr = Option(bits.eval()).map(_.asInstanceOf[ArrayData])
          val nWords = bitsArr.map(_.numElements()).getOrElse(-1)
          val nullWords = bitsArr.map { a =>
            (0 until a.numElements()).count(a.isNullAt)
          }.getOrElse(0)
          if (k < 1) TypeCheckFailure(s"$prettyName: kHash must be >= 1, got $k")
          else if (m < 64 || m % 64 != 0)
            TypeCheckFailure(s"$prettyName: mBits must be a positive multiple of 64, got $m")
          else if (nWords != m / 64)
            TypeCheckFailure(s"$prettyName: bits must hold mBits/64 = ${m / 64} words, got $nWords")
          else if (nullWords > 0)
            // caught here so a malformed filter literal fails at analysis
            // time, not as toLongArray()'s opaque executor-side NPE
            TypeCheckFailure(s"$prettyName: bits must not contain null elements, got $nullWords")
          else TypeCheckSuccess
        }
      case _ => TypeCheckFailure(
        s"$prettyName expects (ARRAY<STRING>, ARRAY<BIGINT>, INT, INT), got (" +
          children.map(_.dataType.simpleString).mkString(", ") + ")")
    }
  }

  private lazy val kH: Int = kHash.eval().asInstanceOf[Number].intValue()
  private lazy val mB: Int = mBits.eval().asInstanceOf[Number].intValue()
  @transient private lazy val words: Array[Long] =
    bits.eval().asInstanceOf[ArrayData].toLongArray()

  override def eval(input: InternalRow): Any = {
    val shs = shingles.eval(input)
    if (shs == null) null
    else BloomHits.count(shs.asInstanceOf[ArrayData], words, kH, mB)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomHits =
    copy(shingles = newChildren(0), bits = newChildren(1),
      kHash = newChildren(2), mBits = newChildren(3))
}

object BloomHits {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** hex13Num(md5(j ':' sh)): the first 13 lowercase-hex chars of the
    * digest parsed base-16 = the first 52 bits big-endian — bytes 0–5
    * whole plus the HIGH nibble of byte 6. Always ≥ 0 (< 2^52). */
  private def position(md: java.security.MessageDigest, j: Int,
      sh: UTF8String, mBits: Int): Int = {
    md.reset()
    md.update(String.valueOf(j).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update(':'.toByte)
    md.update(sh.getBytes)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(6) & 0xffL) >>> 4)
    (v % mBits).toInt
  }

  /** Count of non-null shingles whose kHash positions are ALL set. */
  def count(shs: ArrayData, words: Array[Long], kHash: Int, mBits: Int): Long = {
    val md = digests.get()
    var hits = 0L
    val n = shs.numElements()
    var i = 0
    while (i < n) {
      if (!shs.isNullAt(i)) {
        val sh = shs.getUTF8String(i)
        var all = true
        var j = 0
        while (all && j < kHash) {
          val p = position(md, j, sh, mBits)
          all = ((words(p >>> 6) >>> (p & 63)) & 1L) == 1L
          j += 1
        }
        if (all) hits += 1L
      }
      i += 1
    }
    hits
  }
}
