package graft.data

import graft.Tables
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins from bucketed layout: both sides bucketed by the join
  * key with equal bucket counts must join with no exchange at all. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("bucketing-spec", "4")

  // string-based: AQE wraps exchanges in ShuffleQueryStage nodes whose
  // children are not visible to a SparkPlan tree walk
  private def hasExchange(p: SparkPlan): Boolean = {
    val s = p.toString
    s.contains("Exchange") || s.contains("ShuffleQueryStage") ||
      s.contains("AQEShuffleRead") || s.contains("BroadcastQueryStage")
  }

  test("date-partitioned layout prunes partitions at the scan") {
    // the other half of the write-time layout story: a day-partitioned
    // write turns a date predicate into directory pruning — the scan
    // carries PartitionFilters and never opens the other days' files
    val dir = java.nio.file.Files.createTempDirectory("part-prune").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", expr("CAST(ts_us DIV 86400000000 AS INT)"))
    ev.write.partitionBy("day").mode("overwrite").parquet(dir)
    val firstDay = spark.read.parquet(dir).selectExpr("min(day)").collect()(0).getInt(0)
    // scan-node file counts, from the executed plan's metrics (AQE-aware)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collectLeaves().flatMap(_.metrics.get("numFiles")).map(_.value).sum
    }
    val one = spark.read.parquet(dir).filter(col("day") === firstDay)
    val all = spark.read.parquet(dir)
    val s = one.queryExecution.executedPlan.toString
    // a NON-empty partition-filter list naming the day predicate…
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(s).isDefined,
      "no partition filter at the scan:\n" + s.take(1500))
    // …and strictly fewer files actually read than the full scan
    val allDays = spark.read.parquet(dir).select("day").distinct().count()
    assert(allDays > 1, "testdata spans one day; partition test is vacuous")
    assert(filesRead(one) < filesRead(all),
      s"pruned scan read ${filesRead(one)} of ${filesRead(all)} files — no pruning")
  }

  test("equi-join of two tables bucketed on the key runs with zero shuffles") {
    val sfDir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "b_lineitem", 8, "l_orderkey")
    Bucketing.writeBucketed(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "b_orders", 8, "l_orderkey")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      try {
        val joined = spark.table("b_lineitem")
          .join(spark.table("b_orders"), "l_orderkey")
          .groupBy("l_orderkey").agg(sum("l_quantity").as("q"), max("o_totalprice").as("p"))
        joined.collect()
        // join AND the groupBy on the same key ride the bucket layout:
        // no exchange anywhere in the plan
        assert(!hasExchange(joined.queryExecution.executedPlan),
          "expected a fully co-located plan:\n" +
            joined.queryExecution.executedPlan.toString.take(2000))

        // control: the same join on UNbucketed frames needs SOME exchange
        // (a shuffle, or a broadcast if AQE downgrades at this tiny SF)
        val flat = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        flat.collect()
        assert(hasExchange(flat.queryExecution.executedPlan),
          "control join unexpectedly exchange-free:\n" +
            flat.queryExecution.executedPlan.toString.take(1500))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
