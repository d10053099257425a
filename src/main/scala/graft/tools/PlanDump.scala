package graft.tools

import graft._
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for registry queries to files — the
  * optimization-round evidence artifact (plans/rNN/<query>_<tag>.txt).
  *
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [query...]
  *
  * With no query names, dumps every Bench.headline query. Plans are the
  * pre-execution formatted form (AQE initial plan) — the shape evidence
  * for Exchange count / join strategy / PushedFilters claims.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val tag = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq else Bench.headline
    Files.createDirectories(outDir)
    val spark = Tables.session("plan-dump")
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(outDir.resolve(s"${n}_$tag.txt"), txt)
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $n failed: $e")
          Files.writeString(outDir.resolve(s"${n}_$tag.txt"), s"FAILED: $e\n")
      }
    }
    spark.stop()
    println(s"[plandump] wrote ${names.size} plans to $outDir (tag=$tag)")
  }
}
