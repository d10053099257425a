package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** The two-level filtered-search layout
  * ([[VectorOps.writeCellLangPartitioned]]): coarse cell AND metadata
  * constraint as write-time partition columns, so a filtered probe prunes
  * BOTH directory levels statically. Contracts:
  *   1. the probe's scan carries static PartitionFilters on `cell` and
  *      `lang` and opens strictly fewer files than (a) the full layout
  *      and (b) the same probe without the language level — the second
  *      level pays for itself;
  *   2. the layout probe returns EXACTLY what the in-memory filtered
  *      chain ([[VectorOps.annIvfFiltered]]) returns for the same query —
  *      layout changes the scan cost, never the answer.
  */
class FilteredLayoutSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("filtered-layout-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

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

  test("two-level probe prunes cell AND lang statically and matches the in-memory filtered chain") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-cell-lang").toString
    val emb = Tables.embeddings(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    VectorOps.writeCellLangPartitioned(emb, docs, dir, k = 4)

    val layout = spark.read.parquet(dir)
    assert(layout.select("cell").distinct().count() > 1, "one cell only; pruning vacuous")
    assert(layout.select("lang").distinct().count() > 1, "one lang only; second level vacuous")

    // the query population s14 uses, with its probe list (2 nearest cells
    // by the same (dist2, c_id) order) computed the way the chain does
    val v = VectorOps.quantized(emb)
    val cent = v.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))
    val probeList = v.filter(col("vec_id") % 50 === 0)
      .crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .withColumn("prn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist2"), col("c_id"))))
      .filter(col("prn") <= 2)
      .join(docs.select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
      .select("vec_id", "c_id", "lang").orderBy("vec_id", "c_id").collect()
    val qid = probeList.head.getLong(0)
    val cells = probeList.filter(_.getLong(0) == qid).map(_.getLong(1)).toSeq
    val qlang = probeList.head.getString(2)

    val probe = VectorOps.probeCellLang(spark, dir, cells, qlang, qid, topK = 3)
    val probeRows = probe.collect()
    assert(probeRows.nonEmpty, "probe returned no neighbors")

    // 1a. both partition filters are static on the scan
    val planStr = probe.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(planStr).getOrElse("")
    assert(pf.contains("cell") && pf.contains("lang"),
      s"probe scan must filter both partition levels statically, got: $pf")
    // 1b. fewer files than the full layout AND than a cell-only probe —
    // the language level prunes beyond what the cell level already does
    val full = filesRead(layout)
    val cellOnly = filesRead(layout.filter(col("cell").isInCollection(cells)))
    val pruned = filesRead(probe)
    assert(pruned < cellOnly && cellOnly < full,
      s"expected pruned < cellOnly < full, got $pruned / $cellOnly / $full")

    // 2. answer identical to the in-memory filtered chain for this query
    val expected = VectorOps.annIvfFiltered(emb, docs, k = 4, everyNth = 50,
        nProbe = 2, topK = 3)
      .filter(col("query_id") === qid)
      .select("query_id", "neighbor_id", "rnk", "dot", "cos")
      .collect()
    assert(probeRows.map(_.toString).toSeq == expected.map(_.toString).toSeq,
      s"layout probe diverged from in-memory filtered ANN:\n" +
        s"probe=${probeRows.mkString(";")}\ns14=${expected.mkString(";")}")
  }
}
