package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked COMPOSED-path query: the CDC wire plane and the t13b
  * materialization driven end-to-end under the DuckDB gate.
  *
  * c1 builds a deterministic Debezium changelog OF the documents table —
  * CREATE; inserts where every doc_id ≡ 0 (mod 10) carries STALE
  * placeholder text; a mid-stream ALTER; superseding updates restoring
  * the real text; deletes of every doc_id ≡ 7 (mod 100) — consumes it
  * through [[CdcPipeline.startWire]] (catalog typing, per-position
  * versioning), materializes the latest state, and parses the corpus.
  * The oracle is the point: if every CDC mechanism works, the surviving
  * corpus is EXACTLY `documents` minus the deleted residue class with
  * nothing stale — one plain SQL line DuckDB can state independently of
  * every moving part on the Spark side.
  *
  * Scale shape: the feed build is a narrow projection; the consume is
  * the wire plane's own (typed per-table slices, grouped-union sink);
  * the materialization is ONE keyed agg with max_by(pos_key) — no
  * window, no sort (the registry wrapper adds the gate sort).
  */
object ComposedQueries {

  /** Changelog → latest-state corpus for the registry (UNORDERED; the
    * wrapper below adds the gate sort). */
  def composedCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val cluster = "c1wire"
    val docs = Tables.documents(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft_c1").toString
    val wireDir = s"$root/wire"; val outDir = s"$root/out"
    def put(df: DataFrame): Unit = {
      df.coalesce(1).write.mode("append").parquet(wireDir)
      Thread.sleep(30) // distinct mtimes: the file source preserves order
    }
    val isStale = pmod(col("doc_id"), lit(10)) === 0
    val isDeleted = pmod(col("doc_id"), lit(100)) === 7
    // inserts (stale rows carry placeholder text the updates supersede)
    put(CdcCuration.wireDdlEvent(spark, cluster, 0L,
        CdcCuration.DocumentsCreateDdl, "CREATE")
      .unionByName(CdcCuration.wireDataEvents(
        docs.withColumn("text", when(isStale,
            concat(lit("stale placeholder row "), col("doc_id").cast("string")))
          .otherwise(col("text")))
          .withColumn("n_chars", length(col("text")).cast("long")),
        "c", lit(1000000L) + col("doc_id") * 10, cluster)))
    // ALTER mid-stream, then the superseding updates (typed v2, their
    // image has no quality_hint — forward-compat is part of the check)
    // and the deletes
    put(CdcCuration.wireDdlEvent(spark, cluster, 500000000L,
        "ALTER TABLE `documents` ADD quality_hint BIGINT", "ALTER")
      .unionByName(CdcCuration.wireDataEvents(docs.filter(isStale), "u",
        lit(1000000000L) + col("doc_id") * 10, cluster))
      .unionByName(CdcCuration.wireDataEvents(docs.filter(isDeleted), "d",
        lit(2000000000L) + col("doc_id") * 10, cluster)))
    CdcPipeline.startWire(spark, wireDir, cluster, outDir,
      s"$root/ck", s"$root/state", maxFilesPerTrigger = 2)
      .awaitTermination()
    CdcCuration.corpusFromSnapshot(
      CdcCuration.materializeWire(spark, outDir, "corpusdb.documents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_composed_corpus" ->
      ((spark, sfDir) => composedCorpus(spark, sfDir).orderBy("doc_id")))

  val oracle: Map[String, String] = Map(
    "c1_composed_corpus" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents WHERE doc_id % 100 <> 7""")
}
