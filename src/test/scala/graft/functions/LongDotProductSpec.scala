package graft.functions

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LongDotProductSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("dot-product-spec", "4")

  test("matches the higher-order-function formulation on random arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong,
        Array.fill(64)(rng.nextLong() % 1000000L),
        Array.fill(64)(rng.nextLong() % 1000000L))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("native", expr("graft_dot_long(a, b)"))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null-safe: null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
      .selectExpr("graft_dot_long(a, b) AS d")
    assert(df.collect()(0).isNullAt(0))
  }

  test("mismatched lengths use the common prefix") {
    import spark.implicits._
    val df = Seq((Array(2L, 3L, 100L), Array(5L, 7L)))
      .toDF("a", "b").selectExpr("graft_dot_long(a, b) AS d")
    assert(df.collect()(0).getLong(0) == 2 * 5 + 3 * 7)
  }

  test("stays inside whole-stage codegen") {
    // spark.range source — a local relation would be constant-folded by
    // ConvertToLocalRelation and show no codegen stage at all
    val df = spark.range(100)
      .selectExpr("array(id, id + 1) AS a", "array(id * 2, id) AS b")
      .selectExpr("graft_dot_long(a, b) AS d")
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*("), "expression fell out of codegen:\n" + executed)
    assert(df.agg(sum("d")).collect()(0).getLong(0) ==
      (0L until 100L).map(i => i * i * 2 + (i + 1) * i).sum)
  }
}
