package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PQ storage layout ([[VectorOps.writePqCodes]]): codeword ids as a
  * narrow write-time table partitioned by coarse cell, ADC probing as
  * parquet partition pruning over a codes-only scan. Three contracts:
  *   1. the probe's layout scan carries a static PartitionFilter on
  *      `cell` and opens strictly fewer files than the full layout;
  *   2. that scan's output is ONLY (vec_id, codes[, cell]) — never a raw
  *      vector column — the "scan reads codes, not floats" bandwidth
  *      claim of s7/s9's scaladocs, asserted structurally;
  *   3. the probe returns EXACTLY what the in-memory ADC chain (s7,
  *      [[VectorOps.annPq]]) returns for the same query — layout changes
  *      the scan cost, never the answer.
  */
class PqLayoutSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("pq-layout-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

  // descends into AQE query stages — an executed plan hides every scan
  // behind QueryStageExec leaves, so a plain collectLeaves undercounts
  private def leaves(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(walk) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case _ => Nil
      }))
    walk(df.queryExecution.executedPlan).filter(_.children.isEmpty)
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    leaves(df).flatMap(_.metrics.get("numFiles")).map(_.value).sum
  }

  test("pq codes probe prunes to its cell, scans only codes, and matches the in-memory ADC chain") {
    val dir = java.nio.file.Files.createTempDirectory("pq-codes").toString
    val emb = Tables.embeddings(spark, sfDir)
    VectorOps.writePqCodes(emb, dir)

    val layout = spark.read.parquet(dir)
    assert(layout.select("cell").distinct().count() > 1,
      "all vectors landed in one cell; pruning test is vacuous")

    // query: the s7 population (vec_id % 50 == 0)
    val qid = emb.filter(col("vec_id") % 50 === 0)
      .agg(min("vec_id")).collect()(0).getLong(0)

    val probe = VectorOps.probePqAdc(spark, dir, emb, qid)
    val probeRows = probe.collect()
    assert(probeRows.nonEmpty, "probe returned no neighbors")

    // 1a. static partition filter on the layout scan
    val planStr = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(planStr).isDefined,
      "probe scan carries no partition filter on cell:\n" + planStr.take(1500))
    // 1b. strictly fewer LAYOUT files opened than the layout holds — the
    // probe also scans the embeddings frame (codebook/query/rerank), so
    // count only scans of the layout directory
    def layoutFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      leaves(df)
        .filter(p => p.metrics.contains("numFiles") && p.toString.contains(dir))
        .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    }
    assert(layoutFiles(probe) < layoutFiles(layout),
      s"probe read ${layoutFiles(probe)} of ${layoutFiles(layout)} layout files — no pruning")

    // 2. the layout scans inside the probe read ONLY codes columns — no
    // raw-vector column leaks into the storage read path (the embeddings
    // scans for the codebook/query/rerank are separate relations)
    // real file scans only — AdaptiveSparkPlanExec is childless too and its
    // toString embeds the whole tree (a false match on the dir)
    val layoutScans = leaves(probe)
      .filter(_.metrics.contains("numFiles"))
      .filter(_.toString.contains(dir))
    assert(layoutScans.nonEmpty, "no scan of the layout found in the probe plan")
    val allowed = Set("vec_id", "codes", "cell", "s", "code")
    layoutScans.foreach { sc =>
      val out = sc.output.map(_.name).toSet
      assert(out.subsetOf(allowed),
        s"layout scan reads more than codes: $out")
    }

    // 3. answer identical to the in-memory ADC chain for this query
    val expected = VectorOps.annPq(emb)
      .filter(col("query_id") === qid)
      .collect()
    assert(probeRows.map(_.toString).toSeq == expected.map(_.toString).toSeq,
      s"layout probe diverged from in-memory s7:\nprobe=${probeRows.mkString(";")}\n" +
        s"s7=${expected.mkString(";")}")
  }
}
