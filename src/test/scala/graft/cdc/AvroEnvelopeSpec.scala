package graft.cdc

import graft.Tables
import graft.catalog.MysqlDdlToStruct
import org.apache.avro.Schema
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Avro wire-format fidelity (reference publishes Avro payloads tagged with
  * schema_id; schema/avro_schema avsc files, schema_wrapper.py:97-141).
  */
class AvroEnvelopeSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("avro-envelope-spec", "4")

  test("generated Avro schema parses and covers the payload struct") {
    val s = new Schema.Parser().parse(AvroEnvelope.payloadSchemaJson)
    assert(s.getType == Schema.Type.RECORD)
    assert(s.getFields.size() == AvroEnvelope.payloadStruct.fields.length)
    // nullable fields become ["null", T] unions with null default
    val prev = s.getField("prev_id").schema()
    assert(prev.getType == Schema.Type.UNION)
    assert(prev.getTypes.get(0).getType == Schema.Type.NULL)
  }

  test("DDL-evolved catalog StructTypes produce valid Avro schemas") {
    val create = MysqlDdlToStruct.createTableStruct(
      """CREATE TABLE biz (id BIGINT NOT NULL, name VARCHAR(64),
         score DECIMAL(10,2), active TINYINT(1), opened DATE,
         updated TIMESTAMP(6), tags SET('a','b'), blob_col MEDIUMBLOB,
         tod TIME(6), written DATETIME(6))""")
    val evolved = MysqlDdlToStruct.applyAlter(
      "ALTER TABLE biz ADD COLUMN rating FLOAT AFTER score, DROP COLUMN blob_col",
      create)
    for (struct <- Seq(create, evolved)) {
      val parsed = new Schema.Parser().parse(AvroEnvelope.avroSchemaJson("biz", struct))
      assert(parsed.getFields.size() == struct.fields.length)
    }
    // the SET column maps to an Avro array, TIME to long µs (T11 transforms)
    val parsed = new Schema.Parser().parse(AvroEnvelope.avroSchemaJson("biz", create))
    def nonNull(f: String) = parsed.getField(f).schema().getTypes.get(1)
    assert(nonNull("tags").getType == Schema.Type.ARRAY)
    assert(nonNull("tod").getType == Schema.Type.LONG)
    assert(nonNull("score").getLogicalType.getName == "decimal")
  }

  test("binary round-trip preserves every field including null unions") {
    val env = CdcOps.pipeline(Tables.events(spark, "/root/testdata/sf0.001"))
    val back = AvroEnvelope.roundTrip(env)
    val orig = env.select("event_id", "row_idx", "payload_id", "payload_value",
      "payload_k", "message_type", "tags_sorted", "ts_iso",
      "prev_id", "prev_value", "prev_k")
      .withColumn("row_idx", col("row_idx").cast("int"))
      .withColumn("payload_k", col("payload_k").cast("int"))
      .withColumn("prev_k", col("prev_k").cast("int"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // non-update rows really do ride as Avro nulls
    assert(back.filter(col("prev_id").isNull).count() > 0)
  }

  test("encoded messages are compact binary, not JSON") {
    val env = CdcOps.pipeline(Tables.events(spark, "/root/testdata/sf0.001")).limit(50)
    val sizes = AvroEnvelope.encode(env).collect()
    assert(sizes.nonEmpty)
    // Avro binary of this record is well under 200 bytes; JSON would exceed it
    assert(sizes.forall(m => m.avro.length > 20 && m.avro.length < 200))
    assert(sizes.forall(_.schema_id > 0))
  }
}
