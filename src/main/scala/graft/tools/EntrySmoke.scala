package graft.tools

import graft.{SparkEntry, Tables}

/** Drives the driver's t1 smoke contract: SparkEntry.entry must return >0
  * rows on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("graft-entry-smoke", "4")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[entry-smoke] rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
