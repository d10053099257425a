package graft.cdc

import graft.Tables
import graft.streaming.KafkaWire
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Debezium interop path without a MySQL+Debezium deployment: the
  * engine's own envelope rendered as Debezium change events, shipped
  * through the simulated Kafka broker, and parsed back by the adapter —
  * every mapped field must survive, and the reconstructed images must
  * follow Debezium's before/after semantics per op code.
  */
class DebeziumAdapterSpec extends AnyFunSuite {

  // Tables.session, NOT a bare builder: getOrCreate would otherwise let
  // this suite win the JVM-wide session race WITHOUT GraftExtensions,
  // breaking any concurrently-run suite that needs the native functions
  private lazy val spark = Tables.session("debezium-adapter-spec", "4")

  private val sfDir = "/root/testdata/sf0.001"

  private def envelope = CdcOps.pipeline(Tables.events(spark, sfDir))

  test("envelope → Debezium wire → broker → adapter preserves every mapped field") {
    val env = envelope.persist()
    val back = DebeziumAdapter.fromDebezium(
      KafkaWire.broker(DebeziumAdapter.toDebezium(env))).persist()
    assert(back.count() == env.count())

    // ts_ms is Debezium's precision: compare at the millisecond
    val want = env.select(
      col("cluster_name"), col("database_name"), col("table_name"),
      col("message_type"), col("log_file"), col("log_pos").cast("long"),
      col("row_idx").cast("int"), (col("ts_us") - col("ts_us") % 1000).as("ts_us"),
      col("transaction_id"))
    val got = back.select(
      col("cluster_name"), col("database_name"), col("table_name"),
      col("message_type"), col("log_file"), col("log_pos"),
      col("row_idx"), col("ts_us"), col("transaction_id"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("before/after images follow Debezium op semantics") {
    val back = DebeziumAdapter.fromDebezium(
      KafkaWire.broker(DebeziumAdapter.toDebezium(envelope))).persist()
    // create/refresh: after only; update: both; delete: before only
    assert(back.filter(col("message_type").isin("create", "refresh") &&
      (col("after").isNull || col("before").isNotNull)).count() == 0)
    assert(back.filter(col("message_type") === "update" &&
      (col("after").isNull || col("before").isNull)).count() == 0)
    assert(back.filter(col("message_type") === "delete" &&
      (col("before").isNull || col("after").isNotNull)).count() == 0)
    // the dynamic map carries the row image: spot-check the id field
    // round-trips as the envelope's payload_id
    val env = envelope.select(col("pos_key"), col("payload_id"),
      col("message_type").as("mt"))
    val joined = back
      .withColumn("img", when(col("message_type") === "delete", col("before"))
        .otherwise(col("after")))
      .join(env, col("transaction_id").isNotNull &&
        env("pos_key") === concat_ws(":", col("log_file"),
          lpad(col("log_pos").cast("string"), 10, "0"),
          lpad(col("row_idx").cast("string"), 4, "0")))
    assert(joined.filter(col("img")("id") =!= col("payload_id").cast("string"))
      .count() == 0)
    assert(joined.count() == back.count())
  }

  test("schema-change topic drives the catalog; next data batch's payload follows (T22b)") {
    import spark.implicits._
    import graft.catalog.{SchemaCatalog, TableId}
    val catalog = new SchemaCatalog()
    val id = TableId("dbzcluster", "inventory", "customers")

    // two statements on the schema-change topic, in binlog order
    val ddls = Seq(
      ("dbzcluster", "inventory", "customers", "CREATE",
        "CREATE TABLE `customers` (id INT PRIMARY KEY, name VARCHAR(64))",
        "binlog.000003", 120L, 1700000000000000L),
      ("dbzcluster", "inventory", "customers", "ALTER",
        "ALTER TABLE `customers` ADD email VARCHAR(128) NOT NULL",
        "binlog.000003", 450L, 1700000001000000L))
      .toDF("cluster_name", "database_name", "table_name", "change_type",
        "ddl", "log_file", "log_pos", "ts_us")

    // egress → broker → ingress round trip of the public wire format
    val parsed = DebeziumAdapter.fromSchemaChange(
      KafkaWire.broker(DebeziumAdapter.toSchemaChange(ddls))).persist()
    val got = parsed.orderBy("event_id")
      .select("database_name", "table_name", "change_type", "ddl", "log_pos")
      .as[(String, String, String, String, Long)].collect().toSeq
    assert(got.map(_._5) == Seq(120L, 450L))
    assert(got.map(_._3) == Seq("CREATE", "ALTER"))
    assert(got.forall(r => r._1 == "inventory" && r._2 == "customers"))

    // batch 1: only the CREATE has arrived — payload column set is (id, name)
    assert(DebeziumAdapter.applySchemaChanges(catalog,
      parsed.filter(col("log_pos") === 120L)) == 1)
    assert(catalog.lookup(id).get.struct.fieldNames.toSeq == Seq("id", "name"))

    // batch 2: the ALTER arrives; the catalog evolves AND records the
    // statement's binlog position for the data plane's version intervals
    // (the replayed CREATE re-registers idempotently — same schema_id)
    assert(DebeziumAdapter.applySchemaChanges(catalog, parsed) == 2)
    val ts = catalog.lookup(id).get
    assert(ts.struct.fieldNames.toSeq == Seq("id", "name", "email"))
    assert(ts.pkeys == Seq("id") && !ts.struct("email").nullable)
    // 2^40 file shift: a transaction can push a file past max_binlog_size
    // (2^30), so the pack must not alias large pos into the next file
    assert(catalog.alterEvents == Seq(id -> (3L * (1L << 40) + 450L)))
    // replaying the same stream is idempotent (crash-replayed batch)
    DebeziumAdapter.applySchemaChanges(catalog, parsed)
    assert(catalog.alterEvents.size == 1)

    // the NEXT data batch follows the evolved schema: the connector's
    // dynamic after-image typed by the catalog's current StructType
    val dataJson =
      """{"payload":{"before":null,"after":{"id":"7","name":"amy","email":"amy@x.io"},
         "source":{"version":"2.6","connector":"mysql","name":"dbzcluster",
         "ts_ms":1700000002000,"db":"inventory","table":"customers","server_id":1,
         "gtid":null,"file":"binlog.000003","pos":600,"row":0},
         "op":"c","ts_ms":1700000002000}}""".replaceAll("\n\\s*", "")
    val back = DebeziumAdapter.fromDebezium(
      Seq(dataJson).toDF("value"))
    val typed = back.select(ts.struct.fields.toSeq.map(f =>
      col("after")(f.name).cast(f.dataType).as(f.name)): _*)
    val row = typed.collect()(0)
    assert(row.getInt(0) == 7 && row.getString(1) == "amy" &&
      row.getString(2) == "amy@x.io")
  }

  test("non-table DDL round-trips a null table_name via an empty tableChanges array") {
    import spark.implicits._
    // CREATE DATABASE has no table target: the wire event must carry an
    // EMPTY tableChanges array (not a '"db".""' id), and ingest must map
    // that back to a null table_name — not the empty string a bare
    // regexp_extract would produce
    val ddls = Seq(
      ("dbzcluster", "analytics", Option.empty[String], Option.empty[String],
        "CREATE DATABASE `analytics`", "binlog.000004", 4L, 1700000002000000L))
      .toDF("cluster_name", "database_name", "table_name", "change_type",
        "ddl", "log_file", "log_pos", "ts_us")
    val back = DebeziumAdapter.fromSchemaChange(
      KafkaWire.broker(DebeziumAdapter.toSchemaChange(ddls)))
      .select("database_name", "table_name", "change_type", "ddl")
      .as[(String, Option[String], Option[String], String)].collect().toSeq
    assert(back ==
      Seq(("analytics", None, None, "CREATE DATABASE `analytics`")))
  }

  test("gtid mode wins over the file:pos fallback when present") {
    import spark.implicits._
    val dbz = Seq(
      ("""{"payload":{"before":null,"after":{"id":"1"},"source":{"version":"2.6",
         "connector":"mysql","name":"c1","ts_ms":1700000000000,"db":"d1","table":"t1",
         "server_id":1,"gtid":"3e11fa47-71ca-11e1-9e33-c80aa9429562:55","file":"binlog.000001",
         "pos":4,"row":0},"op":"c","ts_ms":1700000000000}}""", "d1.t1")
    ).toDF("v", "topic")
      .select(col("v").cast("binary").as("value"), col("topic"))
    val out = DebeziumAdapter.fromDebezium(dbz).collect()(0)
    assert(out.getAs[String]("transaction_id") == "3e11fa47-71ca-11e1-9e33-c80aa9429562:55")
    assert(out.getAs[String]("message_type") == "create")
    assert(out.getAs[Long]("ts_us") == 1700000000000000L)
  }
}
