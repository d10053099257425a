package graft.tools

import graft.Tables
import graft.data.CurationPipeline
import graft.streaming.{CdcCuration, CdcPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The CDC plane composed with the curation plane AT SCALE (VERDICT r13
  * #5): a copies-scaled `documents` corpus becomes a Debezium wire
  * changelog — CREATE, staggered inserts across four segments, stale rows
  * superseded by updates, ~1% deletes, a mid-feed ALTER — consumed by
  * [[CdcPipeline.startWire]] with a RESTART between every segment (each
  * AvailableNow run is a cold start that restores catalog + position from
  * the state mirror). The committed batches then materialize to the t13b
  * latest state and the live corpus runs the full [[CurationPipeline]]
  * with manifest verification — the reference's end-to-end shape
  * (end_to_end_test.py + failure_recovery_test.py) over this engine's
  * two planes.
  *
  * Gates (rc=1 on any failure):
  *   - live-row count equals the exact insert/delete arithmetic;
  *   - materialized corpus EQUALS the expected latest state row-for-row;
  *   - pre-ALTER rows keep schema v1, post-ALTER rows carry v2 + the
  *     evolved column (per-position typing held across restarts);
  *   - curation funnel ENGAGES (quality and budget both drop someone)
  *     and the export's x44 manifest verifies.
  *
  * Usage: runMain graft.tools.ComposedRehearsal [srcSfDir] [workDir] [outJson]
  * Env: SPARK_GRAFT_COMPOSED_COPIES (default 10).
  * Writes one JSON line to stdout AND outJson (default BENCH_composed.json).
  */
object ComposedRehearsal {

  private def deleteRec(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_composed")
    val outJson = args.lift(2).getOrElse("BENCH_composed.json")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COMPOSED_COPIES", "10").toInt
    val spark = Tables.session("graft-composed-rehearsal")
    deleteRec(java.nio.file.Paths.get(workDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(workDir))

    val cluster = "composedwire"
    val topic = "corpusdb.documents"
    val segments = 4
    val D_OFF = 10000000L

    // ---- the ground-truth corpus (the state the changelog converges to)
    val base = Tables.documents(spark, src)
    (0 until copies).map { i =>
      val d = base.withColumn("doc_id", col("doc_id") + lit(i * D_OFF))
      if (i <= 1) d
      else d.withColumn("text",
        concat(col("text"), lit(s" uniq$i "), (col("doc_id") % 97).cast("string")))
    }.reduce(_ unionByName _)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32).write.mode("overwrite")
      .parquet(s"$workDir/truth.parquet")
    val truth = spark.read.parquet(s"$workDir/truth.parquet")
    val nTotal = truth.count()

    // segment assignment + churn roles: ~10% of segment-0 docs insert
    // STALE and are superseded by segment-1 updates; ~1% of segment-0/1
    // docs delete in segment 2 (after the ALTER's position)
    val seg = pmod(hash(col("doc_id")), lit(segments)).cast("int")
    val isStale = seg === 0 && pmod(col("doc_id"), lit(10)) === 0
    val isDeleted = seg.isin(0, 1) && pmod(col("doc_id"), lit(100)) === 7

    // ---- Debezium wire events via the shared builders (CdcCuration) --
    // positions: globally monotone by (segment base) + per-doc offset
    def events(df: DataFrame, op: String, posCol: org.apache.spark.sql.Column,
        extra: Boolean): DataFrame =
      CdcCuration.wireDataEvents(df, op, posCol, cluster,
        withQualityHint = extra)
    val wireDir = s"$workDir/wire"
    def writeSeg(df: DataFrame): Unit = {
      df.coalesce(1).write.mode("append").parquet(wireDir)
      Thread.sleep(60) // distinct mtimes: the file source preserves order
    }

    // pos bases per phase (each phase's per-doc offsets stay below the
    // next base: doc_id ≤ copies·D_OFF + 5·10^6 ≪ 10^9/10)
    val P1 = 1L; val P2 = 2000000000L; val P3 = 4000000000L
    val ALTER_POS = 3000000000L
    val segBase = (s: Int) => P1 + s.toLong * 400000000L

    // the four changelog segments, as write thunks — each is WRITTEN then
    // CONSUMED by a fresh startWire run, so every boundary is a cold
    // restart (catalog + position restored from the state mirror: the
    // failure-recovery contract under test)
    val segWriters: Seq[() => Unit] = Seq(
      // segment 0: CREATE + inserts (stale docs carry placeholder text)
      () => writeSeg(CdcCuration.wireDdlEvent(spark, cluster, 0L,
        CdcCuration.DocumentsCreateDdl, "CREATE")
        .unionByName(events(
          truth.filter(seg === 0).withColumn("text",
            when(isStale, concat(lit("stale placeholder row "),
              col("doc_id").cast("string"))).otherwise(col("text")))
            .withColumn("n_chars", length(col("text")).cast("long")),
          "c", lit(segBase(0)) + col("doc_id") * 10, extra = false))),
      // segment 1: inserts + the superseding updates for segment 0's stale
      () => writeSeg(events(truth.filter(seg === 1), "c",
          lit(segBase(1)) + col("doc_id") * 10, extra = false)
        .unionByName(events(truth.filter(isStale), "u",
          lit(P2) + col("doc_id") * 10, extra = false))),
      // segment 2: ALTER, then evolved inserts + the deletes
      () => writeSeg(CdcCuration.wireDdlEvent(spark, cluster, ALTER_POS,
        "ALTER TABLE `documents` ADD quality_hint BIGINT", "ALTER")
        .unionByName(events(truth.filter(seg === 2), "c",
          lit(P3) + col("doc_id") * 10, extra = true))
        .unionByName(events(truth.filter(isDeleted), "d",
          lit(P3 + 1000000000L) + col("doc_id") * 10, extra = false))),
      // segment 3: evolved inserts
      () => writeSeg(events(truth.filter(seg === 3), "c",
        lit(P3 + 2000000000L) + col("doc_id") * 10, extra = true)))

    val outDir = s"$workDir/out"
    var feedSec = 0.0
    var consumeSec = 0.0
    var restarts = 0
    segWriters.foreach { write =>
      val t0 = System.nanoTime()
      write()
      feedSec += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      CdcPipeline.startWire(spark, wireDir, cluster, outDir,
        s"$workDir/ck", s"$workDir/state", maxFilesPerTrigger = 1)
        .awaitTermination()
      restarts += 1
      consumeSec += (System.nanoTime() - t1) / 1e9
    }

    // ---- materialize + corpus equality gates ---------------------------
    val fails = Seq.newBuilder[String]
    val t2 = System.nanoTime()
    val mat = CdcCuration.materializeWire(spark, outDir, topic).persist()
    val nLive = mat.count()
    val nDeleted = truth.filter(isDeleted).count()
    if (nLive != nTotal - nDeleted)
      fails += s"composed:live_count($nLive != $nTotal - $nDeleted)"
    val corpus = CdcCuration.corpusFromSnapshot(mat)
    val want = truth.filter(!isDeleted)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val missing = want.exceptAll(corpus).count()
    val phantom = corpus.exceptAll(want).count()
    if (missing + phantom != 0)
      fails += s"composed:corpus_divergence(missing=$missing,phantom=$phantom)"
    // per-position typing across restarts: segment 0/1 rows (and the
    // stale-superseding updates, all pre-ALTER positions) stay v1;
    // segment 2/3 rows carry v2 AND the evolved column
    val verBad2 = mat
      .withColumn("seg", pmod(hash(col("row_id")), lit(segments)).cast("int"))
      .withColumn("post",
        get_json_object(col("payload_json"), "$.quality_hint").isNotNull)
      .filter((col("seg").isin(2, 3) && (!col("post") || col("schema_version") =!= 2)) ||
        (col("seg").isin(0, 1) && (col("post") || col("schema_version") =!= 1)))
      .count()
    if (verBad2 != 0) fails += s"composed:schema_versioning($verBad2 rows)"
    val materializeSec = (System.nanoTime() - t2) / 1e9

    // ---- the composed curation run -------------------------------------
    // The budget must ENGAGE (the r12 stream-rehearsal lesson: derive it
    // from measured pre-gate pressure, never a hand-picked "∝ corpus"
    // constant — this corpus's verbatim copies make decontamination cut
    // far deeper than the base corpus, and 95k×copies sat above every
    // source's surviving pressure). Replicate the chain's own gates up
    // to the budget stage and take half the MINIMUM source's tokens:
    // every source exhausts it mid-stream, the first admitted doc per
    // source still admits, so neither direction can go vacuous.
    val t3 = System.nanoTime()
    val gatedPressure = {
      import graft.data.TextOps
      val kept = corpus.join(
        TextOps.filterFlags(corpus).filter(col("keep")).select("doc_id"), "doc_id")
      val deduped = kept.join(
        TextOps.dedupExact(kept).select(col("keeper").as("doc_id")), "doc_id")
      deduped.join(
          TextOps.decontaminateAgainst(deduped, corpus)
            .filter(!col("is_contaminated")).select("doc_id"), "doc_id")
        .join(TextOps.tokenCount(corpus).select("doc_id", "bpe_tokens"), "doc_id")
        .groupBy("source").agg(sum("bpe_tokens").as("t"))
        .agg(min("t")).collect()(0).getLong(0)
    }
    val budgetTokens = math.max(1L, gatedPressure / 2)
    println(s"[composed] derived budget=$budgetTokens (min-source pressure $gatedPressure)")
    val rep = CurationPipeline.run(corpus, None,
      CurationPipeline.Config(budgetTokens = budgetTokens,
        semDedupMaxIter = 8), s"$workDir/export")
    val curateSec = (System.nanoTime() - t3) / 1e9
    if (!rep.manifestVerified) fails += "composed:manifest_unverified"
    val byStage = rep.stageCounts.toMap
    if (byStage("filter") >= rep.total) fails += "composed:quality_vacuous"
    if (byStage("budget_cap") >= byStage("decontaminate"))
      fails += "composed:budget_vacuous"
    if (rep.exported == 0L || rep.exported != byStage("budget_cap"))
      fails += s"composed:export_mismatch(${rep.exported})"
    mat.unpersist()

    val failList = fails.result()
    val total = feedSec + consumeSec + materializeSec + curateSec
    val json =
      s"""{"metric":"composed_rehearsal","value":$total,"unit":"sec",""" +
        s""""copies":$copies,"src":"$src","n_total":$nTotal,""" +
        s""""n_deleted":$nDeleted,"n_live":$nLive,"restarts":$restarts,""" +
        s""""budget_tokens":$budgetTokens,""" +
        s""""feed_sec":$feedSec,"consume_sec":$consumeSec,""" +
        s""""materialize_sec":$materializeSec,"curate_sec":$curateSec,""" +
        s""""funnel":${rep.stageCounts.map { case (n, c) =>
          "\"" + n + "\":" + c }.mkString("{", ",", "}")},""" +
        s""""exported":${rep.exported},"manifest_verified":${rep.manifestVerified},""" +
        s""""gate_fails":[${failList.map("\"" + _ + "\"").mkString(",")}]}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    spark.stop()
    if (failList.nonEmpty) {
      System.err.println(s"[composed] GATE FAILURES: ${failList.mkString(", ")}")
      sys.exit(1)
    }
  }
}
