package graft.streaming

import graft.Tables
import graft.data.CurationPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The CDC plane composed with the curation plane end-to-end (VERDICT r13
  * #5): a Debezium wire stream of an upstream `documents` OLTP table —
  * inserts, updates that supersede stale rows, deletes, a mid-stream
  * ALTER, and a restart between segments — flows through
  * [[CdcPipeline.startWire]], materializes to the t13b latest state, and
  * that live corpus runs the full [[CurationPipeline]] with manifest
  * verification. Reference anchors: end_to_end_test.py:337-370 (rows
  * through the pipeline) + failure_recovery_test.py:227-349 (restart
  * changes nothing).
  */
class CdcCurationComposedSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("cdc-curation-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

  private val cluster = "curwire"
  private val topic = "corpusdb.documents"

  /** Debezium data events built FROM DataFrame rows via to_json — text
    * payloads contain arbitrary characters, so the JSON is assembled by
    * the engine, never by string splicing. `posCol` must be monotone
    * within the feed (it keys the per-position typing and pos_key). */
  private def dataEvents(docs: DataFrame, op: String,
      posCol: org.apache.spark.sql.Column): DataFrame = {
    val image = struct(
      col("doc_id").cast("string").as("doc_id"), col("text").as("text"),
      col("lang").as("lang"), col("source").as("source"),
      col("n_chars").cast("string").as("n_chars"))
    val imageT =
      "struct<doc_id:string,text:string,lang:string,source:string,n_chars:string>"
    val payload = struct(
      (if (op == "d") image else lit(null).cast(imageT)).as("before"),
      (if (op == "d") lit(null).cast(imageT) else image).as("after"),
      struct(lit("2.6").as("version"), lit("mysql").as("connector"),
        lit(cluster).as("name"), lit(1700000000000L).as("ts_ms"),
        lit("corpusdb").as("db"), lit("documents").as("table"),
        lit(1L).as("server_id"), lit(null).cast("string").as("gtid"),
        lit("binlog.000001").as("file"), posCol.cast("long").as("pos"),
        lit(0).as("row")).as("source"),
      lit(op).as("op"), lit(1700000000000L).as("ts_ms"))
    docs.select(
      lit(s"$cluster.$topic").as("topic"),
      lit(null).cast("binary").as("key"),
      to_json(struct(payload.as("payload"))).cast("binary").as("value"),
      array().cast("array<struct<key:string,value:binary>>").as("headers"))
  }

  private def schemaEvent(pos: Long, ddl: String, typ: String): (String, String) =
    (cluster,
      s"""{"payload":{"source":{"version":"2.6","connector":"mysql","name":"$cluster","ts_ms":1700000000000,"db":"corpusdb","table":"documents","server_id":1,"gtid":null,"file":"binlog.000001","pos":$pos,"row":0},"ts_ms":1700000000000,"databaseName":"corpusdb","schemaName":null,"ddl":"$ddl","tableChanges":[{"type":"$typ","id":"\\"corpusdb\\".\\"documents\\""}]}}""")

  private def writeRaw(dir: String, events: Seq[(String, String)]): Unit = {
    import spark.implicits._
    events.toDF("topic", "json")
      .select(col("topic"), lit(null).cast("binary").as("key"),
        col("json").cast("binary").as("value"),
        array().cast("array<struct<key:string,value:binary>>").as("headers"))
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(50)
  }

  private def writeDf(dir: String, df: DataFrame): Unit = {
    df.coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(50)
  }

  /** The two feed segments over fresh dirs. Returns (seg1 writer, seg2
    * writer) thunks so callers choose restart points. */
  private def feedSegments(wireDir: String): (() => Unit, () => Unit) = {
    val docs = Tables.documents(spark, sfDir)
    // docs 0..49 start STALE (placeholder text a later update supersedes);
    // 9000-block docs duplicate docs 100..109's text (dedup must engage)
    val seg1 = () => {
      val stale = docs.filter(col("doc_id") < 50)
        .withColumn("text", concat(lit("stale stale stale row "),
          col("doc_id").cast("string")))
        .withColumn("n_chars", length(col("text")).cast("long"))
      val fresh1 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 250)
      val dups = docs.filter(col("doc_id") >= 100 && col("doc_id") < 110)
        .withColumn("doc_id", col("doc_id") + 8900) // 9000..9009
      writeRaw(wireDir, Seq(schemaEvent(100,
        "CREATE TABLE `documents` (doc_id BIGINT PRIMARY KEY, text TEXT, " +
          "lang VARCHAR(8), source VARCHAR(32), n_chars BIGINT)", "CREATE")))
      writeDf(wireDir,
        dataEvents(stale.unionByName(fresh1), "c", lit(1000) + col("doc_id") * 10)
          .unionByName(dataEvents(dups, "c", lit(5000) + (col("doc_id") - 9000) * 10)))
    }
    val seg2 = () => {
      val upd = docs.filter(col("doc_id") < 50) // real text supersedes stale
      val dels = docs.filter(col("doc_id") >= 240 && col("doc_id") < 250)
      writeDf(wireDir,
        dataEvents(upd, "u", lit(10000) + col("doc_id") * 10)
          .unionByName(dataEvents(dels, "d", lit(11000) + (col("doc_id") - 240) * 10)))
      writeRaw(wireDir, Seq(schemaEvent(20000,
        "ALTER TABLE `documents` ADD quality_hint BIGINT", "ALTER")))
      val fresh2 = docs.filter(col("doc_id") >= 250)
        .withColumn("quality_hint", (col("doc_id") % 5).cast("long"))
      // post-ALTER inserts carry the evolved column in their image
      val image2 = struct(
        col("doc_id").cast("string").as("doc_id"), col("text").as("text"),
        col("lang").as("lang"), col("source").as("source"),
        col("n_chars").cast("string").as("n_chars"),
        col("quality_hint").cast("string").as("quality_hint"))
      val payload2 = struct(
        lit(null).cast("struct<doc_id:string,text:string,lang:string," +
          "source:string,n_chars:string,quality_hint:string>").as("before"),
        image2.as("after"),
        struct(lit("2.6").as("version"), lit("mysql").as("connector"),
          lit(cluster).as("name"), lit(1700000000000L).as("ts_ms"),
          lit("corpusdb").as("db"), lit("documents").as("table"),
          lit(1L).as("server_id"), lit(null).cast("string").as("gtid"),
          lit("binlog.000001").as("file"),
          (lit(20010L) + (col("doc_id") - 250) * 10).as("pos"),
          lit(0).as("row")).as("source"),
        lit("c").as("op"), lit(1700000000000L).as("ts_ms"))
      writeDf(wireDir, fresh2.select(
        lit(s"$cluster.$topic").as("topic"),
        lit(null).cast("binary").as("key"),
        to_json(struct(payload2.as("payload"))).cast("binary").as("value"),
        array().cast("array<struct<key:string,value:binary>>").as("headers")))
    }
    (seg1, seg2)
  }

  /** Expected latest-state corpus: all 500 docs (0..49 superseded to real
    * text) minus the 10 deleted, plus the 10 dup-injected. */
  private def expectedCorpus(): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.filter(col("doc_id") < 240 || col("doc_id") >= 250)
      .unionByName(docs.filter(col("doc_id") >= 100 && col("doc_id") < 110)
        .withColumn("doc_id", col("doc_id") + 8900))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  test("CDC wire → materialize → curation survives restart + mid-stream ALTER") {
    val root = Files.createTempDirectory("cdc-curation").toString
    val wireDir = s"$root/wire"; val outDir = s"$root/out"
    val (seg1, seg2) = feedSegments(wireDir)

    // segment 1, then a SHUTDOWN, then segment 2 on a restarted consumer
    seg1()
    CdcPipeline.startWire(spark, wireDir, cluster, outDir, s"$root/ck",
      s"$root/state", maxFilesPerTrigger = 2).awaitTermination()
    seg2()
    CdcPipeline.startWire(spark, wireDir, cluster, outDir, s"$root/ck",
      s"$root/state", maxFilesPerTrigger = 2).awaitTermination()

    // ---- t13b latest state: updates superseded, deletes gone ----------
    val mat = CdcCuration.materializeWire(spark, outDir, topic)
    assert(mat.count() === 500L, "490 live originals + 10 dup-injected")
    // per-position typing across the restart: rows before the ALTER keep
    // version 1, rows after it carry version 2 AND the evolved column
    val v = mat.withColumn("post",
        get_json_object(col("payload_json"), "$.quality_hint").isNotNull)
      .groupBy("schema_version", "post").count()
      .collect().map(r => (r.getLong(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(v((1L, false)) === 250L, s"pre-ALTER rows must stay v1: $v")
    assert(v((2L, true)) === 250L, s"post-ALTER rows must be v2 + evolved: $v")

    // ---- the corpus parse equals the ground-truth latest state --------
    val corpus = CdcCuration.corpusFromSnapshot(mat)
    val want = expectedCorpus()
    assert(corpus.exceptAll(want).isEmpty && want.exceptAll(corpus).isEmpty,
      "materialized corpus diverges from the expected latest state")

    // ---- the composed curation run: funnel engaged, manifest green ----
    val rep = CdcCuration.curateWire(spark, outDir, topic,
      CurationPipeline.Config(budgetTokens = 200L, nShards = 4),
      s"$root/export")
    assert(rep.total === 500L)
    assert(rep.manifestVerified, "composed export failed manifest verification")
    val byStage = rep.stageCounts.toMap
    assert(byStage("filter") < rep.total, "quality gate vacuous")
    assert(byStage("dedup_exact") <= byStage("filter") - 1,
      s"dup-injected docs must be deduped: ${rep.stageCounts}")
    assert(byStage("budget_cap") < byStage("decontaminate"),
      s"budget cap vacuous: ${rep.stageCounts}")
    assert(rep.exported === byStage("budget_cap") && rep.exported > 0L)
    // the dup-injected 9000-block must lose to its lower-id originals
    val exported = spark.read.parquet(s"$root/export")
    assert(exported.filter(col("doc_id") >= 9000).count() === 0L,
      "a dup-injected doc survived exact dedup")

    // ---- restart-invariance: an uninterrupted twin exports the same ---
    val root2 = Files.createTempDirectory("cdc-curation-twin").toString
    val wire2 = s"$root2/wire"; val out2 = s"$root2/out"
    val (s1b, s2b) = feedSegments(wire2)
    s1b(); s2b()
    CdcPipeline.startWire(spark, wire2, cluster, out2, s"$root2/ck",
      s"$root2/state", maxFilesPerTrigger = 2).awaitTermination()
    val corpus2 = CdcCuration.corpusFromSnapshot(
      CdcCuration.materializeWire(spark, out2, topic))
    assert(corpus.exceptAll(corpus2).isEmpty && corpus2.exceptAll(corpus).isEmpty,
      "restarted and uninterrupted runs materialized different corpora")
    val rep2 = CdcCuration.curateWire(spark, out2, topic,
      CurationPipeline.Config(budgetTokens = 200L, nShards = 4),
      s"$root2/export")
    assert(rep2.stageCounts === rep.stageCounts && rep2.exported === rep.exported)
    val exp2 = spark.read.parquet(s"$root2/export")
    assert(exported.exceptAll(exp2).isEmpty && exp2.exceptAll(exported).isEmpty,
      "composed exports diverge between restarted and uninterrupted runs")
  }
}
