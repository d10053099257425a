package graft.tools

import graft._

/** One-shot executed-plan audit: print the join strategies and scan
  * schemas of the named registry queries (default: the r8 events ops) —
  * the quick check that pushdown reached the scan and no join flipped
  * to a cartesian/BNLJ. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("plan-audit", "8")
    val qs = if (args.nonEmpty) args.toSeq
             else Seq("q32_activity_similarity", "q33_session_funnel",
               "q34_rate_anomaly", "x47_cms_audit")
    for (q <- qs) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val scans = "ReadSchema: [^\n]*".r.findAllIn(p).toSeq
      val joins = Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "CartesianProduct", "BroadcastNestedLoopJoin", "InMemoryTableScan")
        .map(k => k -> k.r.findAllIn(p).size).filter(_._2 > 0)
      println(s"== $q joins=$joins")
      scans.foreach(s => println("   " + s.take(140)))
    }
    spark.stop()
  }
}
