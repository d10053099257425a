package graft.tools
import graft._
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("explain", "4")
    for (n <- Seq("t08_blacklist", "t12_envelope")) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      println(s"===== $n =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(4000))
    }
    spark.stop()
  }
}
