package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF storage layout ([[VectorOps.writeCellPartitioned]]): cell
  * assignment as a write-time partition column, probe-time cell pruning as
  * parquet partition pruning. Two contracts:
  *   1. the probe's scan carries a static PartitionFilter on `cell` and
  *      opens strictly fewer files than a full scan;
  *   2. the storage-layout probe returns EXACTLY what the in-memory
  *      cell-join plan (s6, [[VectorOps.annIvfTrained]]) returns for the
  *      same query — layout changes the scan cost, never the answer.
  */
class IvfLayoutSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("ivf-layout-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

  // descends into AQE query stages — an executed plan hides every scan
  // behind QueryStageExec leaves, so a plain collectLeaves undercounts
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(walk) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case _ => Nil
      }))
    walk(df.queryExecution.executedPlan)
      .filter(_.children.isEmpty)
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
  }

  test("cell-partitioned probe prunes to its cell and matches the in-memory IVF plan") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-cells").toString
    val emb = Tables.embeddings(spark, sfDir)
    VectorOps.writeCellPartitioned(emb, dir, k = 4)

    val assigned = spark.read.parquet(dir)
    val nCells = assigned.select("cell").distinct().count()
    assert(nCells > 1, "all vectors landed in one cell; pruning test is vacuous")

    // query: same population s6 uses (vec_id % 50 == 0), cell looked up
    // from the written layout
    val qRow = assigned.filter(col("vec_id") % 50 === 0)
      .select("vec_id", "cell").orderBy("vec_id").limit(1).collect()(0)
    // the partition column reads back via directory-value inference (INT),
    // not the written LONG — accept either width
    val (qid, qcell) = (qRow.getLong(0), qRow.getAs[Number](1).longValue())

    val probe = VectorOps.probeCell(spark, dir, Seq(qcell), qid, topK = 3)
    val probeRows = probe.collect()

    // 1a. static partition filter on the scan
    val planStr = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(planStr).isDefined,
      "probe scan carries no partition filter on cell:\n" + planStr.take(1500))
    // 1b. strictly fewer files opened than the full layout holds
    assert(filesRead(probe) < filesRead(assigned),
      s"probe read ${filesRead(probe)} of ${filesRead(assigned)} files — no pruning")

    // 2. answer identical to the in-memory cell-join plan for this query
    val expected = VectorOps.annIvfTrained(emb, k = 4, everyNth = 50, topK = 3)
      .filter(col("query_id") === qid)
      .select("query_id", "neighbor_id", "rnk", "dot", "cos")
      .collect()
    assert(probeRows.map(_.toString).toSeq == expected.map(_.toString).toSeq,
      s"layout probe diverged from in-memory IVF:\nprobe=${probeRows.mkString(";")}\n" +
        s"s6=${expected.mkString(";")}")
    assert(probeRows.nonEmpty, "probe returned no neighbors")
  }
}
