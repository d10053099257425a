package graft.cdc

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pos_key is THE total per-row order: it keys max_by materialization
  * (t13b), per-topic sink ordering (T26), and resume comparisons (T28+).
  * Its LEXICOGRAPHIC order must therefore equal the (log_file, log_pos,
  * row_idx) tuple order across the full uint32 log_pos range — Spark's
  * lpad TRUNCATES overlong input, so an insufficient pad width corrupts
  * the order silently (the round-2 review caught exactly that at width 5).
  */
class PosKeySpec extends AnyFunSuite {

  private lazy val spark = Tables.session("pos-key-spec", "4")

  test("pos_key string order equals (log_file, log_pos, row_idx) tuple order up to uint32") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(400) { _ =>
      val file = f"binlog.${rnd.nextInt(3)}%06d"
      // bias toward boundary magnitudes: 1-digit through 10-digit positions
      val pos = math.min(4294967295L,
        math.abs(rnd.nextLong()) % math.pow(10, 1 + rnd.nextInt(10)).toLong)
      val idx = rnd.nextInt(3000)
      (file, pos, idx)
    }.distinct
    val df = rows.toDF("log_file", "log_pos", "row_idx")
      // the SAME construction CdcOps.envelope uses
      .withColumn("pos_key", concat_ws(":", col("log_file"),
        lpad(col("log_pos").cast("string"), 10, "0"),
        lpad(col("row_idx").cast("string"), 4, "0")))
    val byKey = df.orderBy("pos_key")
      .select("log_file", "log_pos", "row_idx").as[(String, Long, Int)].collect().toSeq
    val byTuple = rows.sortBy(identity)
    assert(byKey == byTuple,
      s"pos_key order diverges from tuple order; first diff: ${
        byKey.zip(byTuple).find { case (a, b) => a != b }}")
  }

  test("no truncation: a 10-digit position round-trips through the key") {
    import spark.implicits._
    val key = Seq(("f1", 4294967295L, 2999)).toDF("log_file", "log_pos", "row_idx")
      .select(concat_ws(":", col("log_file"),
        lpad(col("log_pos").cast("string"), 10, "0"),
        lpad(col("row_idx").cast("string"), 4, "0")).as("k"))
      .as[String].head()
    assert(key == "f1:4294967295:2999")
  }
}
