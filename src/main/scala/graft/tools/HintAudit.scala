package graft.tools

import graft.{SparkEntry, Tables}

/** One-off audit: for every registry query, count broadcast hints that fall
  * outside the structural whitelist (nation/region leaves, group-less
  * aggregates) and describe the hinted frame, so the PlanSpec hint-budget
  * pin can be written from measured fact rather than guesswork.
  */
object HintAudit {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias, ResolvedHint}
    val spark = Tables.session("hint-audit", "4")
    val sfDir = "/root/testdata/sf0.001"

    def scalarRoot(p: LogicalPlan): Boolean = p match {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case pr: Project => scalarRoot(pr.child)
      case s: SubqueryAlias => scalarRoot(s.child)
      case _ => false
    }

    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val bad = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.filterNot { h =>
          val fixedDim = {
            val leaves = h.child.collectLeaves()
            leaves.nonEmpty && leaves.forall { l =>
              val cols = l.output.map(_.name)
              cols.nonEmpty && cols.forall(c => c.startsWith("n_") || c.startsWith("r_"))
            }
          }
          scalarRoot(h.child) || fixedDim
        }
        val ms = (System.nanoTime() - t0) / 1000000
        val descr = bad.map(h => h.child.output.map(_.name).take(6).mkString("[", ",", "]")).mkString(" ")
        println(f"AUDIT $name%-28s n=${bad.size} build_ms=$ms $descr")
      } catch {
        case e: Exception =>
          println(s"AUDIT $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
