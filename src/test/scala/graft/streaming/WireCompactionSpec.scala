package graft.streaming

import java.nio.file.Files

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The wire-sink maintenance contracts ([[CdcPipeline.compactWireBatches]]
  * / [[CdcPipeline.expireWireBatches]]), pinned the same way the cell
  * layout's compaction is:
  *
  *  - over-threshold spans of old batch dirs → ONE coalesced single-file
  *    dir keyed by the span's highest id;
  *  - the retained window, sealed spans, and partial tails are compliant
  *    — byte-identical across calls;
  *  - the row SET and the per-topic pos_key ORDER are preserved exactly;
  *  - each batch's rows are rewritten at most once (sealing), so repeated
  *    maintenance converges to a no-op;
  *  - a half-applied span (crash between the commit marker and the
  *    publish rename) completes on the next call with no row lost.
  */
class WireCompactionSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("wire-compaction-spec", "4")

  /** Synthesize `nBatches` sink-shaped batch dirs: 2 topics × 3 rows per
    * batch, pos_key monotone across batches (binlog order), 2 files per
    * dir (the sink's topic repartition), plus one empty DDL-only dir. */
  private def mkOut(nBatches: Int): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("wire-compact").toString
    (0 until nBatches).foreach { b =>
      if (b == 2) {
        // DDL-only batch: the sink still publishes an (empty) dir
        Files.createDirectories(java.nio.file.Paths.get(s"$out/batch=$b"))
      } else {
        Seq.tabulate(6) { i =>
          val topic = if (i % 2 == 0) "inv.customers" else "inv.orders"
          (topic, f"binlog.000001:${b * 100 + i}%010d:0000", s"payload-$b-$i")
        }.toDF("topic", "pos_key", "payload_json")
          .repartition(2, col("topic")).sortWithinPartitions("pos_key")
          .write.mode("append").parquet(s"$out/batch=$b")
      }
    }
    out
  }

  private def readAll(out: String) =
    spark.read.parquet(out)
      .select(col("topic"), col("pos_key"), col("payload_json"),
        col("batch").cast("long").as("batch"))

  private def perTopicSeq(out: String): Map[String, Seq[String]] =
    readAll(out).orderBy("topic", "batch", "pos_key")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  private def bytesOf(out: String, dir: String): Map[String, Long] = {
    val p = java.nio.file.Paths.get(s"$out/$dir")
    if (!Files.exists(p)) Map.empty
    else Files.list(p).toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      .filter(Files.isRegularFile(_))
      .map(f => (f.getFileName.toString, Files.size(f))).toMap
  }

  test("spans coalesce; rows, per-topic order, retained window preserved") {
    val out = mkOut(10)
    val beforeRows = perTopicSeq(out)
    val retainedBytes = Seq("batch=7", "batch=8", "batch=9").map(bytesOf(out, _))

    val rep = CdcPipeline.compactWireBatches(spark, out,
      retainLast = 3, spanSize = 4)
    // ids 0..6 eligible: weights 1 each → [0..3] seals at weight 4,
    // [4..6] is a partial tail (weight 3) and stays
    assert(rep.spans == Seq((0L, 3L)), rep)
    assert(rep.dirsBefore == 10 && rep.dirsAfter == 7, rep)
    assert(rep.filesAfter < rep.filesBefore, rep)

    // row set + per-topic binlog order preserved exactly
    assert(perTopicSeq(out) == beforeRows)
    // the span dir is ONE data file, rows sorted by (topic, pos_key)
    val spanFiles = Files.list(java.nio.file.Paths.get(s"$out/batch=3"))
      .toArray.toSeq.map(_.toString)
      .filter(f => !f.split('/').last.startsWith("_") &&
        !f.split('/').last.startsWith("."))
    assert(spanFiles.size == 1, spanFiles)
    val spanRows = spark.read.parquet(s"$out/batch=3")
      .select("topic", "pos_key").collect().map(r => (r.getString(0), r.getString(1)))
    assert(spanRows.toSeq == spanRows.toSeq.sorted,
      "span rows must be stored sorted by (topic, pos_key)")
    // the retained window is byte-identical
    assert(Seq("batch=7", "batch=8", "batch=9").map(bytesOf(out, _)) == retainedBytes)

    // convergence: a second call finds only the sealed span + the
    // partial tail — nothing merges, nothing is rewritten
    val sealedBytes = bytesOf(out, "batch=3")
    val rep2 = CdcPipeline.compactWireBatches(spark, out,
      retainLast = 3, spanSize = 4)
    assert(rep2.spans.isEmpty && rep2.dirsAfter == 7, rep2)
    assert(bytesOf(out, "batch=3") == sealedBytes,
      "sealed spans must never be rewritten")
    assert(perTopicSeq(out) == beforeRows)
  }

  test("partial tail seals once enough batches age past the window") {
    import spark.implicits._
    val out = mkOut(10)
    CdcPipeline.compactWireBatches(spark, out, retainLast = 3, spanSize = 4)
    // one more committed batch ages batch=7 into the eligible set:
    // tail [4,5,6,7] reaches weight 4 and seals
    Seq(("inv.customers", f"binlog.000001:${1000}%010d:0000", "p"))
      .toDF("topic", "pos_key", "payload_json")
      .write.mode("append").parquet(s"$out/batch=10")
    val rep = CdcPipeline.compactWireBatches(spark, out,
      retainLast = 3, spanSize = 4)
    assert(rep.spans == Seq((4L, 7L)), rep)
    val ids = readAll(out).select("batch").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(3L, 7L, 8L, 9L, 10L), ids)
  }

  test("a half-applied span (marker left behind) completes with no row lost") {
    val out = mkOut(8)
    val beforeRows = perTopicSeq(out)
    // simulate the crash window: span [0..3] fully staged + marker
    // committed, but sources not yet retired and staging not renamed
    val grp = (0 to 3).filterNot(_ == 2).map(b => s"$out/batch=$b")
    spark.read.parquet(grp: _*)
      .repartition(1).sortWithinPartitions("topic", "pos_key")
      .write.parquet(s"$out/.span_0_3.staging")
    Files.createFile(java.nio.file.Paths.get(
      s"$out/.span_0_3.staging/_span_w4"))
    Files.createFile(java.nio.file.Paths.get(s"$out/._compact_0_3.commit"))

    val rep = CdcPipeline.compactWireBatches(spark, out,
      retainLast = 3, spanSize = 64)
    assert(perTopicSeq(out) == beforeRows,
      "recovery must finish the staged span without losing rows")
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/._compact_0_3.commit")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/batch=0")))
    assert(Files.exists(java.nio.file.Paths.get(s"$out/batch=3")))
    assert(rep.spans.isEmpty, "recovery is not a new span")
  }

  test("expiry deletes only dirs entirely below the cutoff") {
    val out = mkOut(10)
    CdcPipeline.compactWireBatches(spark, out, retainLast = 3, spanSize = 4)
    val deleted = CdcPipeline.expireWireBatches(spark, out, belowId = 6)
    assert(deleted == Seq(3L, 4L, 5L), deleted)
    val ids = readAll(out).select("batch").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(6L, 7L, 8L, 9L), ids)
  }
}
