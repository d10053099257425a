package graft.streaming

import graft.Tables
import graft.cdc.CdcOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka wire contract, both directions, without broker or connector
  * jar (neither exists in this container): sink/source schemas pinned as
  * the connector's public contract, and the full
  * envelope → producer wire → simulated broker → consumer wire → envelope
  * loop round-trip-tested, batch and streaming.
  */
class KafkaWireSpec extends AnyFunSuite {

  // Tables.session, NOT a bare builder: getOrCreate would otherwise let
  // this suite win the JVM-wide session race WITHOUT GraftExtensions,
  // breaking any concurrently-run suite that needs the native functions
  private lazy val spark = Tables.session("kafka-wire-spec", "4")

  private val sfDir = "/root/testdata/sf0.001"

  private def envelope = CdcOps.pipeline(Tables.events(spark, sfDir))

  test("kafkaFrame matches the kafka sink schema; broker matches the source schema") {
    // assertable contract: same names, same types up to nullability —
    // nullability is the connector's to relax, never a type difference
    def conforms(got: org.apache.spark.sql.types.StructType,
                 want: org.apache.spark.sql.types.StructType): Unit = {
      assert(got.fieldNames.toSeq == want.fieldNames.toSeq)
      got.fields.zip(want.fields).foreach { case (g, w) =>
        assert(g.dataType.catalogString == w.dataType.catalogString,
          s"${g.name}: ${g.dataType.catalogString} vs ${w.dataType.catalogString}")
      }
    }
    val sink = CdcPipeline.kafkaFrame(envelope)
    conforms(sink.schema, KafkaWire.sinkSchema)
    conforms(KafkaWire.broker(sink).schema, KafkaWire.sourceSchema)
  }

  test("envelope → kafka wire → broker → adapter round-trips every row and column") {
    val env = envelope
    val back = KafkaWire.fromKafka(KafkaWire.broker(CdcPipeline.kafkaFrame(env)), env.schema)
    assert(back.columns.toSeq == env.columns.toSeq)
    assert(back.count() == env.count())
    assert(env.exceptAll(back).isEmpty && back.exceptAll(env).isEmpty)
  }

  test("per-topic offset order equals binlog (pos_key) order") {
    val env = envelope
    val src = KafkaWire.broker(CdcPipeline.kafkaFrame(env))
    // within every (topic, partition): offsets ascend exactly with key —
    // a consumer reading offset-ascending replays binlog order (T26)
    val violations = src
      .withColumn("prev_key", lag(col("key"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("topic", "partition").orderBy("offset")))
      .filter(col("prev_key").isNotNull && col("prev_key") >= col("key"))
      .count()
    assert(violations == 0L)
    // and a topic never straddles partitions (total per-table order)
    assert(src.groupBy("topic").agg(countDistinct("partition").as("p"))
      .filter(col("p") > 1).count() == 0L)
  }

  test("fromKafka is streaming-safe: the adapter runs over a kafka-shaped stream") {
    import spark.implicits._
    val env = envelope
    val wire = KafkaWire.broker(CdcPipeline.kafkaFrame(env))
      .as[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
      .collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
    val srcDf = stream.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val q = KafkaWire.fromKafka(srcDf, env.schema)
      .writeStream.format("memory").queryName("kafka_adapter").outputMode("append").start()
    try {
      stream.addData(wire.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("kafka_adapter")
      assert(got.count() == env.count())
      assert(env.exceptAll(got).isEmpty && got.exceptAll(env).isEmpty)
    } finally q.stop()
  }
}
