package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline a library user actually runs end to end:
  * quality filter (x16) → exact dedup keeper selection (d1) →
  * semantic dedup (d12, embedding-space SemDeDup) →
  * benchmark decontamination (x12) → per-source token-budget cap (x35) →
  * seeded shuffle-shard export (x34) → shard-partitioned parquet write →
  * read-back.
  *
  * Each stage is oracle-checked individually; what this spec pins is the
  * COMPOSITION: the stages connect on doc_id without schema friction, the
  * exported shards are internally consistent (contiguous positions,
  * disjoint docs, nothing lost), and the whole run is deterministic —
  * a re-run writes byte-identical shard content, which is what makes a
  * 100 TB export resumable and auditable.
  */
class CurationPipelineSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("curation-pipeline-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

  // the chain itself lives in CurationPipeline (r11) — the spec drives
  // the PUBLIC API, so what's pinned here is exactly what a user gets
  private def runPipeline(outDir: String): (Long, Long, Long, Seq[org.apache.spark.sql.Row]) = {
    val docs = Tables.documents(spark, sfDir)
    val rep = CurationPipeline.run(docs,
      Some(Tables.embeddings(spark, sfDir)),
      CurationPipeline.Config(budgetTokens = 2000L, nShards = 4), outDir)
    // the funnel is monotone: each stage can only shrink the corpus
    val counts = rep.total +: rep.stageCounts.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"stage funnel not monotone: ${rep.stageCounts}")
    // the written export verifies against its own manifest (r12)
    assert(rep.manifestVerified, "fresh export failed manifest verification")
    val back = spark.read.parquet(outDir)
    val rows = back.orderBy("shard", "pos").collect().toSeq
    (rep.total, rep.stageCounts.last._2, rep.exported, rows)
  }

  test("filter → dedup → decontaminate → shard export composes losslessly and deterministically") {
    val dir1 = java.nio.file.Files.createTempDirectory("curation1").toString
    val (total, nClean, nExported, rows1) = runPipeline(dir1)

    // the gates actually gate (corpus has short/duplicate/contaminated docs)
    assert(nClean < total, s"no document was filtered ($nClean of $total)")
    assert(nClean > 0, "pipeline filtered everything — vacuous")
    // nothing lost or duplicated between assignment and the written shards
    assert(nExported == nClean, s"export wrote $nExported of $nClean docs")
    val back = spark.read.parquet(dir1)
    assert(back.select("doc_id").distinct().count() == nClean, "duplicate doc in shards")

    // per-shard positions are contiguous 0..n-1 — the contract a trainer
    // reading shard files in pos order depends on
    val perShard = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
      .collect()
    assert(perShard.length > 1, "all docs landed in one shard")
    for (r <- perShard) {
      val (n, mn, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mn == 0L && mx == n - 1, s"shard ${r.get(0)} positions not contiguous: n=$n range=[$mn,$mx]")
    }

    // determinism: a second full run reproduces the exact export
    val dir2 = java.nio.file.Files.createTempDirectory("curation2").toString
    val (_, _, _, rows2) = runPipeline(dir2)
    assert(rows1.map(_.toString) == rows2.map(_.toString),
      "re-run diverged — the export is not reproducible")
  }

  test("verifyExport catches a re-ordered and a substituted shard member that a row count passes") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("curation_mf").toString
    val rep = CurationPipeline.run(docs, None,
      CurationPipeline.Config(budgetTokens = 2000L, nShards = 4), dir)
    assert(rep.manifestVerified && CurationPipeline.verifyExport(docs, dir))

    val back = spark.read.parquet(dir)
      .withColumn("shard", col("shard").cast("long"))
    // a shard with at least two members, so a reorder is possible
    val s = back.groupBy("shard").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).orderBy("shard").collect()(0).getLong(0)

    def tamperedDir(df: org.apache.spark.sql.DataFrame): String = {
      val d = java.nio.file.Files.createTempDirectory("curation_tamper").toString
      df.write.mode("overwrite").partitionBy("shard").parquet(d)
      // the stored manifest travels with the export unchanged — the
      // attacker/bitrot model is the DATA moving under a stale manifest
      spark.read.parquet(CurationPipeline.manifestDir(dir))
        .write.mode("overwrite").parquet(CurationPipeline.manifestDir(d))
      d
    }

    // (a) re-order: swap positions 0 and 1 within one shard — n_docs,
    // max_pos, n_tokens are all unchanged; only the order-sensitive
    // checksum can catch it
    val reordered = back.withColumn("pos",
      when(col("shard") === s && col("pos") === 0L, lit(1L))
        .when(col("shard") === s && col("pos") === 1L, lit(0L))
        .otherwise(col("pos")))
    assert(!CurationPipeline.verifyExport(docs, tamperedDir(reordered)),
      "re-ordered shard members passed manifest verification")

    // (b) substitute: replace one member's doc_id with a foreign id —
    // the member count per shard is unchanged
    val substituted = back.withColumn("doc_id",
      when(col("shard") === s && col("pos") === 0L, lit(999999999L))
        .otherwise(col("doc_id")))
    assert(!CurationPipeline.verifyExport(docs, tamperedDir(substituted)),
      "substituted shard member passed manifest verification")
  }

  test("importance resampling slots between decontamination and the budget cap") {
    val docs = Tables.documents(spark, sfDir)
    val outDir = java.nio.file.Files.createTempDirectory("curation3").toString
    val rep = CurationPipeline.run(docs,
      Some(Tables.embeddings(spark, sfDir)),
      CurationPipeline.Config(budgetTokens = 2000L, nShards = 4,
        resample = true), outDir)
    val byName = rep.stageCounts.toMap
    assert(rep.stageCounts.map(_._1) == Seq("filter", "dedup_exact",
      "semdedup", "decontaminate", "importance_resample", "budget_cap"))
    // the resample gate ENGAGES (accepts a strict, non-empty subset)
    assert(byName("importance_resample") < byName("decontaminate"),
      s"resample accepted everything: ${rep.stageCounts}")
    assert(byName("importance_resample") > 0, "resample rejected everything")
    // composition stays lossless through the extra stage
    assert(rep.exported == byName("budget_cap"),
      s"export lost rows: ${rep.exported} != ${byName("budget_cap")}")
    val counts = rep.total +: rep.stageCounts.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"stage funnel not monotone: ${rep.stageCounts}")
  }
}
