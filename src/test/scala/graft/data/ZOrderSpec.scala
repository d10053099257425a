package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order layout ([[ZOrder]]): Morton-cell directories prune a 2-D
  * box query's scan, and the layout never changes the answer.
  *   1. encode/decode round-trip and locality sanity of the curve;
  *   2. the box query's scan carries a static PartitionFilter on
  *      `zbucket` and opens strictly fewer files than the full layout;
  *   3. box results equal the brute-force filter over the raw frame.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("zorder-spec", "4")

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

  test("morton encode/decode round-trips and interleaves as documented") {
    for ((x, y) <- Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L))) {
      assert(ZOrder.decode(ZOrder.z(x, y)) == ((x, y)))
    }
    assert(ZOrder.z(1, 0) == 1L && ZOrder.z(0, 1) == 2L && ZOrder.z(1, 1) == 3L)
  }

  test("sql zExpr matches the driver-side mirror") {
    import spark.implicits._
    val df = Seq((3L, 5L), (1000L, 2000L), (65535L, 1L)).toDF("x", "y")
      .withColumn("z", expr(ZOrder.zExpr("x", "y")))
    val got = df.select("x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, zv) => assert(zv == ZOrder.z(x, y)) }
  }

  test("bucketsFor grid walk equals exhaustive keyspace intersection and is box-bounded") {
    // reference: the r7 full-keyspace filter (every bucket whose aligned
    // wx×wy rectangle intersects the box) — correct but O(2^(2Bits−shift))
    def exhaustive(x0: Long, x1: Long, y0: Long, y1: Long, shift: Int): Seq[Long] = {
      val wx = 1L << ((shift + 1) / 2)
      val wy = 1L << (shift / 2)
      val zMax = ZOrder.z((1L << ZOrder.Bits) - 1, (1L << ZOrder.Bits) - 1)
      (0L to (zMax >> shift)).filter { b =>
        val (cx, cy) = ZOrder.decode(b << shift)
        cx <= x1 && cx + wx - 1 >= x0 && cy <= y1 && cy + wy - 1 >= y0
      }
    }
    val boxes = Seq((0L, 255L, 0L, 255L), (100L, 5000L, 7L, 7L),
      (65000L, 65535L, 65000L, 65535L), (0L, 65535L, 0L, 0L),
      (300L, 301L, 9000L, 12000L))
    for (shift <- Seq(20, 21, 22); (x0, x1, y0, y1) <- boxes) {
      assert(ZOrder.bucketsFor(x0, x1, y0, y1, shift).sorted ==
        exhaustive(x0, x1, y0, y1, shift).sorted,
        s"grid walk diverged at shift=$shift box=($x0,$x1,$y0,$y1)")
    }
    // the fix's point: a SMALL shift must stay O(box/cell), not O(keyspace)
    // — shift=2 was a 1G-iteration hang in the r7 form; here a 4×4 box at
    // shift=2 (2×2-point cells) plans instantly and returns its 4 cells
    assert(ZOrder.bucketsFor(0L, 3L, 0L, 3L, 2).length == 4)
    // degenerate/out-of-range boxes clamp instead of overflowing
    assert(ZOrder.bucketsFor(10L, 5L, 0L, 0L, 22).isEmpty)
    assert(ZOrder.bucketsFor(-5L, 3L, 0L, 3L, 22) ==
      ZOrder.bucketsFor(0L, 3L, 0L, 3L, 22))
  }

  test("z-layout box query prunes the scan and matches the brute-force filter") {
    import spark.implicits._
    val shift = 16 // 256-wide × 256-tall aligned cells
    // deterministic uniform grid over [0, 4096)²: key mixing via fixed
    // multipliers, NOT random, so the spec is reproducible
    val raw = spark.range(0, 20000)
      .select(col("id"),
        (col("id") * 48271 % 4096).as("x"),
        (col("id") * 16807 % 4096).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(raw, "x", "y", dir, shift)

    val layout = spark.read.parquet(dir)
    assert(layout.select("zbucket").distinct().count() > 4,
      "layout collapsed into too few cells; pruning test is vacuous")

    val (x0, x1, y0, y1) = (600L, 1000L, 2000L, 2600L)
    val boxed = ZOrder.queryBox(spark, dir, "x", "y", x0, x1, y0, y1, shift)
    val planStr = boxed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*zbucket".r.findFirstIn(planStr).isDefined,
      "box query must carry a static zbucket PartitionFilter:\n" +
        planStr.linesIterator.take(20).mkString("\n"))

    val filesBox = filesRead(boxed)
    val filesAll = filesRead(layout)
    assert(filesBox < filesAll,
      s"box read $filesBox of $filesAll files — no pruning happened")

    val got = boxed.select("id", "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = raw.filter(col("x").between(x0, x1) && col("y").between(y0, y1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "layout changed the answer")
  }
}
