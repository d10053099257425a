package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka wire contract, both directions.
  *
  * The reference's production topology is binlog → streamer → Kafka
  * (an async producer flushed per batch,
  * reference `batch/base_parse_replication_stream.py:207-221`), and its
  * consumers read those table-topics. In Spark terms the sink side is
  * `df.write.format("kafka")` over [[CdcPipeline.kafkaFrame]]'s columns and
  * the consume side is `spark.readStream.format("kafka")`, whose fixed
  * output schema is public contract (Structured Streaming Kafka Integration
  * Guide). The spark-sql-kafka connector jar is NOT on this classpath and
  * no broker exists in the container, so the contract is pinned here as
  * literal StructTypes asserted in tests, plus a deterministic simulated
  * broker that turns sink rows into source rows — the full
  * envelope → producer wire → broker → consumer wire → envelope loop is
  * round-trip-tested without the jar. Against a real cluster the only
  * change is swapping [[broker]] for `format("kafka")` on both ends.
  */
object KafkaWire {

  /** Columns `format("kafka")` accepts on write (topic required since we
    * don't set a default topic option; headers need includeHeaders=true). */
  val sinkSchema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", BinaryType, nullable = true))), containsNull = false),
      nullable = true)))

  /** Columns `format("kafka")` emits on read (sans headers, which only
    * appear with includeHeaders=true). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  /** Simulated broker: producer-wire rows → consumer-wire rows.
    *
    * Partitioning models the streamer's contract: every row of a topic
    * lands in ONE partition (the reference publishes each table-topic
    * effectively single-partition so per-table order is total; our sink
    * keys rows by pos_key for exactly that ordering guarantee — T26).
    * Offsets are the per-(topic, partition) arrival order, i.e. pos_key
    * order, so a consumer reading offset-ascending replays the binlog
    * order — the property the round-trip test asserts. The timestamp
    * models LogAppendTime (timestampType=1) deterministically; consumers
    * must not depend on it (a real broker stamps wall-clock).
    *
    * Scale: one window partition per (topic, partition) — exactly the
    * parallelism a real broker gives a topic-partition; no global sort. */
  def broker(sink: DataFrame, numPartitions: Int = 8): DataFrame = {
    val w = Window.partitionBy("topic", "partition").orderBy(col("key"))
    sink
      .withColumn("partition", pmod(xxhash64(col("topic")), lit(numPartitions)).cast("int"))
      .withColumn("offset", row_number().over(w).cast("long") - 1)
      .withColumn("timestamp",
        timestamp_millis(lit(1700000000000L) + col("offset")))
      .withColumn("timestampType", lit(1))
      .select("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
  }

  /** Consumer-side adapter: a kafka-source-shaped frame (simulated broker
    * here; `readStream.format("kafka")` in production — the transform is
    * streaming-safe, see KafkaWireSpec's MemoryStream test) back to the
    * typed envelope. The JSON value is authoritative; key/offset exist for
    * partitioning and resume, never for payload. Narrow projection —
    * from_json is codegen'd, no shuffle. */
  def fromKafka(src: DataFrame, envelopeSchema: StructType): DataFrame =
    src.select(from_json(col("value").cast("string"), envelopeSchema).as("m"))
      .select(col("m.*"))
}
