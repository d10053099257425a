package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[Tables.events]] loading contract across the two `ts`
  * encodings the driver's testdata has shipped (TIMESTAMP(NANOS) read as
  * LONG nanoseconds under the legacy flag, and TIMESTAMP_MICROS/NTZ): both
  * must land on the SAME `ts_us` values — DuckDB's `epoch_us(ts)` — and an
  * unrecognized encoding must fail AT LOAD, not corrupt 44 downstream
  * queries silently. Round 6 lost the entire CDC surface to exactly this
  * (the testdata regenerated mid-round with a new encoding and the loader
  * kept applying the old arithmetic).
  */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("tables-spec", "4")

  // epoch micros exercising truncation (sub-µs ns digits) and a value far
  // from any round boundary
  private val micros = Seq(1700000000123456L, 1700000000999999L, 1712345678901234L)

  private def tmpDir(): String =
    Files.createTempDirectory("tables_spec").toString

  test("LONG-nanos and TIMESTAMP_MICROS encodings produce identical ts_us") {
    // legacy encoding: ts as a LONG of nanoseconds (what
    // spark.sql.legacy.parquet.nanosAsLong yields on a NANOS column)
    val longDir = tmpDir()
    val longRows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, us * 1000L + 789L) // sub-µs digits must truncate away
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(longRows, 1),
        StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")

    // current encoding: ts as TIMESTAMP_NTZ micros (what a parquet
    // TIMESTAMP_MICROS isAdjustedToUTC=0 column arrives as)
    val ntzDir = tmpDir()
    val ntzRows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(ntzRows, 1),
        StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampNTZType))))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    def tsUs(dir: String): Map[Long, Long] =
      Tables.events(spark, dir).select("event_id", "ts_us").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val fromLong = tsUs(longDir)
    val fromNtz = tsUs(ntzDir)
    val expected = micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
    assert(fromLong == expected, s"nanos-long path: $fromLong != $expected")
    assert(fromNtz == expected, s"micros-ntz path: $fromNtz != $expected")
  }

  test("TIMESTAMP (UTC-adjusted) encoding also lands on epoch micros") {
    val tzDir = tmpDir()
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L)))
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampType))))
      .write.mode("overwrite").parquet(s"$tzDir/events.parquet")
    val got = Tables.events(spark, tzDir).select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
    assert(got == expected, s"timestamp path: $got != $expected")
  }

  test("an unrecognized ts encoding fails at load, not downstream") {
    val badDir = tmpDir()
    spark.range(3).select(col("id").as("event_id"), col("id").cast("string").as("ts"))
      .write.mode("overwrite").parquet(s"$badDir/events.parquet")
    val e = intercept[RuntimeException](Tables.events(spark, badDir))
    assert(e.getMessage.contains("unsupported type"),
      s"expected a fail-fast load error, got: ${e.getMessage}")
  }
}
