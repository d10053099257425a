package graft.cdc

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream

/** Avro wire format for the CDC envelope.
  *
  * The reference publishes every message as Avro bytes tagged with a
  * schema_id from its registry (reference schema/avro_schema avsc files,
  * components/schema_wrapper.py:97-141 registers the table's Avro schema;
  * util/message_builder.py:51-78 builds the enveloped payload). Here:
  *
  *   - [[avroSchemaJson]] derives the Avro record schema from a Spark
  *     `StructType` — the same direction the reference's Schematizer
  *     registration takes (MySQL DDL → Avro; acceptance fixtures
  *     acceptance/simple_statements.feature:18-22), so the schema catalog's
  *     DDL-evolved StructTypes map straight to registerable Avro.
  *   - [[encode]]/[[decode]] run per-partition with one reusable
  *     `GenericDatumWriter`/`Reader` + recycled Binary{Encoder,Decoder} —
  *     the executor-side batch shape a Kafka Avro producer drops into.
  *     No driver round-trip, no shuffle: both are narrow mapPartitions.
  *
  * Correctness gate: `t12b_avro_roundtrip` encodes the envelope payload to
  * Avro binary and decodes it back; its output hash-matches the plain
  * projection oracle, proving the bytes preserve every field exactly.
  */
object AvroEnvelope {

  /** Spark → Avro type mapping (nullable fields become ["null", T] unions,
    * matching the reference's registered schemas where every column is
    * nullable unless declared NOT NULL). */
  def avroType(dt: DataType): String = dt match {
    case LongType => "\"long\""
    case IntegerType | ShortType | ByteType => "\"int\""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case BooleanType => "\"boolean\""
    case StringType => "\"string\""
    case BinaryType => "\"bytes\""
    case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
    case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
    case d: DecimalType =>
      s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
    case ArrayType(et, _) => s"""{"type":"array","items":${avroType(et)}}"""
    case s: StructType => avroSchemaJson("nested", s)
    case other => throw new IllegalArgumentException(s"no avro mapping for $other")
  }

  /** `pkeys` marks primary-key fields with a 1-based `"pkey": N` ordinal
    * attribute — the registry convention the reference's Schematizer uses
    * to carry key order inside the Avro schema (key info sourced from
    * information_schema KEY_COLUMN_USAGE, mysql_parser.py:166-181). Extra
    * attributes are legal Avro and ignored by plain decoders. */
  def avroSchemaJson(recordName: String, struct: StructType, pkeys: Seq[String] = Nil): String = {
    val fields = struct.fields.map { f =>
      val t = if (f.nullable) s"""["null",${avroType(f.dataType)}]""" else avroType(f.dataType)
      val dflt = if (f.nullable) ",\"default\":null" else ""
      val pk = pkeys.indexOf(f.name)
      val pkAttr = if (pk >= 0) s""","pkey":${pk + 1}""" else ""
      s"""{"name":"${f.name}","type":$t$dflt$pkAttr}"""
    }
    s"""{"type":"record","name":"$recordName","namespace":"graft.cdc",""" +
      s""""fields":[${fields.mkString(",")}]}"""
  }

  /** The envelope subset that rides inside the Avro payload. prev_* are
    * genuinely nullable (non-update rows) → exercises null unions. */
  final case class EnvelopePayload(
      event_id: Long, row_idx: Int,
      payload_id: Long, payload_value: Double, payload_k: Int,
      message_type: String, tags_sorted: String, ts_iso: String,
      prev_id: Option[Long], prev_value: Option[Double], prev_k: Option[Int])

  final case class AvroMessage(event_id: Long, row_idx: Int, schema_id: Int, avro: Array[Byte])

  val payloadStruct: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("row_idx", IntegerType, nullable = false),
    StructField("payload_id", LongType, nullable = false),
    StructField("payload_value", DoubleType, nullable = false),
    StructField("payload_k", IntegerType, nullable = false),
    StructField("message_type", StringType, nullable = false),
    StructField("tags_sorted", StringType, nullable = false),
    StructField("ts_iso", StringType, nullable = false),
    StructField("prev_id", LongType, nullable = true),
    StructField("prev_value", DoubleType, nullable = true),
    StructField("prev_k", IntegerType, nullable = true)))

  val payloadSchemaJson: String = avroSchemaJson("envelope_payload", payloadStruct)

  /** envelope DF → Avro-encoded messages. One writer + recycled encoder per
    * partition; schema parsed once per partition (Schema is not
    * serializable, so it travels as JSON — same pattern as a registry
    * lookup by schema_id on the executor). */
  def encode(env: DataFrame): Dataset[AvroMessage] = {
    val spark = env.sparkSession
    import spark.implicits._
    val schemaJson = payloadSchemaJson
    env.selectExpr("event_id", "CAST(row_idx AS INT) AS row_idx", "payload_id",
      "payload_value", "CAST(payload_k AS INT) AS payload_k",
      "message_type", "tags_sorted", "ts_iso",
      "prev_id", "prev_value", "CAST(prev_k AS INT) AS prev_k", "schema_id")
      .as[(Long, Int, Long, Double, Int, String, String, String,
        Option[Long], Option[Double], Option[Int], Int)]
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val out = new ByteArrayOutputStream(256)
        var enc = EncoderFactory.get().binaryEncoder(out, null)
        rows.map { case (eid, ridx, pid, pval, pk, mt, tags, iso, prevId, prevVal, prevK, sid) =>
          val rec = new GenericData.Record(schema)
          rec.put("event_id", eid); rec.put("row_idx", ridx)
          rec.put("payload_id", pid); rec.put("payload_value", pval)
          rec.put("payload_k", pk); rec.put("message_type", mt)
          rec.put("tags_sorted", tags); rec.put("ts_iso", iso)
          rec.put("prev_id", prevId.map(Long.box).orNull)
          rec.put("prev_value", prevVal.map(Double.box).orNull)
          rec.put("prev_k", prevK.map(Int.box).orNull)
          out.reset()
          enc = EncoderFactory.get().binaryEncoder(out, enc)
          writer.write(rec, enc)
          enc.flush()
          AvroMessage(eid, ridx, sid, out.toByteArray)
        }
      }
  }

  /** Avro messages → decoded payload rows (reader reused per partition). */
  def decode(messages: Dataset[AvroMessage]): Dataset[EnvelopePayload] = {
    val spark = messages.sparkSession
    import spark.implicits._
    val schemaJson = payloadSchemaJson
    messages.mapPartitions { msgs =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      msgs.map { m =>
        val dec = DecoderFactory.get().binaryDecoder(m.avro, null)
        val rec = reader.read(null, dec)
        def str(f: String) = rec.get(f).toString
        def optLong(f: String) = Option(rec.get(f)).map(_.asInstanceOf[Long])
        def optDouble(f: String) = Option(rec.get(f)).map(_.asInstanceOf[Double])
        def optInt(f: String) = Option(rec.get(f)).map(_.asInstanceOf[Int])
        EnvelopePayload(
          rec.get("event_id").asInstanceOf[Long],
          rec.get("row_idx").asInstanceOf[Int],
          rec.get("payload_id").asInstanceOf[Long],
          rec.get("payload_value").asInstanceOf[Double],
          rec.get("payload_k").asInstanceOf[Int],
          str("message_type"), str("tags_sorted"), str("ts_iso"),
          optLong("prev_id"), optDouble("prev_value"), optInt("prev_k"))
      }
    }
  }

  /** encode → decode → DataFrame; equals the plain projection iff the Avro
    * bytes carry every field exactly (the t12b oracle check). */
  def roundTrip(env: DataFrame): DataFrame = decode(encode(env)).toDF()

  // ---- generic (schema-driven) round-trip ----------------------------

  private def toAvro(row: Row, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType | IntegerType | DoubleType | FloatType | BooleanType =>
        row.get(i).asInstanceOf[AnyRef]
      case ByteType => Int.box(row.getByte(i).toInt)
      case ShortType => Int.box(row.getShort(i).toInt)
      case StringType => row.getString(i)
      case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
      case d: DecimalType =>
        // decimal logical type: two's-complement unscaled bytes at the
        // schema's scale (Avro spec "decimal"; the reference's registry
        // encodes MySQL DECIMAL columns this way)
        val bd = row.getDecimal(i).setScale(d.scale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case DateType => // logical date: days since epoch
        Int.box(row.getDate(i).toLocalDate.toEpochDay.toInt)
      case TimestampType =>
        Long.box(row.getTimestamp(i).toInstant.toEpochMilli * 1000L +
          row.getTimestamp(i).getNanos / 1000 % 1000)
      case ArrayType(StringType, _) =>
        val l = new java.util.ArrayList[String]()
        row.getSeq[String](i).foreach(l.add)
        l
      case other => throw new IllegalArgumentException(s"no avro writer for $other")
    }

  private def fromAvro(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case LongType | IntegerType | DoubleType | FloatType | BooleanType => v
      case ByteType => v.asInstanceOf[Int].toByte
      case ShortType => v.asInstanceOf[Int].toShort
      case StringType => v.toString
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case d: DecimalType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a)
        new java.math.BigDecimal(new java.math.BigInteger(a), d.scale)
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case ArrayType(StringType, _) =>
        import scala.jdk.CollectionConverters._
        v.asInstanceOf[java.util.List[AnyRef]].asScala.map(_.toString).toSeq
      case other => throw new IllegalArgumentException(s"no avro reader for $other")
    }

  /** Schema-driven encode → decode for ANY DataFrame whose types the
    * [[avroType]] mapping covers — the wire-fidelity proof for the full
    * MySQL type matrix (t12c): DECIMAL as logical-decimal unscaled bytes,
    * DATE as logical-date ints, BINARY as bytes, the int family at its
    * Avro widths. Same per-partition writer/reader reuse as the fixed
    * envelope codec; narrow, no shuffle. */
  def roundTripGeneric(df: DataFrame): DataFrame = {
    val struct = df.schema
    val schemaJson = avroSchemaJson("generic_payload", struct)
    val fields = struct.fields
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(struct)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val reader = new GenericDatumReader[GenericRecord](schema)
      val out = new ByteArrayOutputStream(256)
      var benc = EncoderFactory.get().binaryEncoder(out, null)
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(row, i, f.dataType))
        }
        out.reset()
        benc = EncoderFactory.get().binaryEncoder(out, benc)
        writer.write(rec, benc)
        benc.flush()
        val dec = DecoderFactory.get().binaryDecoder(out.toByteArray, null)
        val back = reader.read(null, dec)
        Row.fromSeq(fields.toIndexedSeq.map(f => fromAvro(back.get(f.name), f.dataType)))
      }
    }
  }
}
