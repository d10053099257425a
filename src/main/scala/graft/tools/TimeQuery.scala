package graft.tools

import graft.{SparkEntry, Tables}

/** Time individual SparkEntry queries: runMain graft.tools.TimeQuery <sfDir> <name>... */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Tables.session("graft-timequery")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
