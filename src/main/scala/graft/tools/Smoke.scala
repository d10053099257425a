package graft.tools
import org.apache.spark.sql.SparkSession
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session("graft-smoke", "4")
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("events", "documents", "embeddings", "lineitem")) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      println(s"== $t count=${df.count()}")
      df.printSchema()
      df.show(3, 60)
    }
    spark.stop()
  }
}
