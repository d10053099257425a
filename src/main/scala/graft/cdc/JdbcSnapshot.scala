package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T4's other half: the initial bulk snapshot (reference FullRefreshRunner
  * — the refresh workflow that bulk-copies a table through its
  * `<table>_data_pipeline_refresh` shadow and whose INSERTs the stream
  * reader retargets back to the base table as RefreshMessages; reference
  * `components/low_level_binlog_stream_reader_wrapper.py:114-124`,
  * SURVEY §2.1 T4). The incremental path (T4 retarget of refresh-table
  * traffic already in the binlog) has been covered since round 1; this
  * object supplies the BOOTSTRAP: how the copy itself is produced, and
  * how its rows enter the SAME operator chain as incremental traffic.
  *
  * Spark-first shape: the reference copies row ranges in a single-node
  * loop (`INSERT INTO refresh_table SELECT ... WHERE id BETWEEN ...`); on
  * Spark the copy is ONE partitioned JDBC scan — `numPartitions`
  * concurrent range queries on the key column, each executor holding one
  * range — and everything downstream is the ordinary declarative chain.
  * At 100 TB the scan parallelism is bounded by the SOURCE database, not
  * the cluster: partition count models the reference's batch-size
  * throttle (`FullRefreshRunner --batch-size`), not Spark's.
  */
object JdbcSnapshot {

  /** Production reader: a partitioned JDBC bulk scan of the source table.
    * Untestable in this container (no MySQL / JDBC driver jar), so the
    * shape is exercised through [[refreshFrame]]/[[ingest]] with a
    * parquet stand-in — exactly the simulated-broker trick the Kafka
    * sink uses. Kept trivially thin so there is nothing here to test. */
  def read(spark: SparkSession, url: String, table: String, keyCol: String,
      lower: Long, upper: Long, numPartitions: Int,
      props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, keyCol, lower, upper, numPartitions, props)

  /** Snapshot rows → the binlog-frame shape, PRE-retarget: each source
    * row becomes one WriteRows image on the refresh table
    * (`is_refresh = true`, `table_name = base + suffix`), which is
    * precisely what the reference's copy loop makes the binlog emit. All
    * derivations are deterministic functions of the key/value columns so
    * a DuckDB oracle can replay them:
    *   - `event_id` = key; `log_pos` = (key mod 10^9) * 4 in the given
    *     snapshot binlog file — the modulus keeps the position inside
    *     pos_key's 10-digit pad (Spark's lpad TRUNCATES overlong input,
    *     which would corrupt the total order) for ANY key; snapshot rows
    *     appear once per payload_id, so intra-snapshot position aliasing
    *     above 10^9 keys never affects a max_by winner;
    *   - `k` = 3 * (key mod 10^5) — the modulus keeps the Int from
    *     overflowing on production-scale keys (a negative k would make
    *     explodeRows' `sequence(0, k % 3)` DESCEND and duplicate rows);
    *     `k % 3 == 0`, so [[CdcOps.explodeRows]] emits EXACTLY ONE row
    *     image per source row (a bulk copy must not duplicate rows),
    *     while `k % 4` still varies for the SET column;
    *   - `message_type` = 'create' (WriteRows), retargeted to 'refresh'
    *     by the standard T4 path. */
  def refreshFrame(snapshot: DataFrame, database: String, baseTable: String,
      keyCol: String, valueCol: String, fileSeq: Long = 1L): DataFrame =
    snapshot.select(
      col(keyCol).cast("bigint").as("event_id"),
      (lit(1700000000000000L) + col(keyCol).cast("bigint")).as("ts_us"),
      col(valueCol).cast("double").as("value"),
      ((col(keyCol).cast("bigint") % 100000L) * 3).cast("int").as("k"),
      lit("data").as("kind"),
      lit("create").as("message_type"),
      lit(database).as("database_name"),
      lit(baseTable).as("base_table"),
      lit(baseTable + CdcSqlFragments.REFRESH_SUFFIX).as("table_name"),
      lit(true).as("is_refresh"),
      lit(f"binlog.$fileSeq%06d").as("log_file"),
      ((col(keyCol).cast("bigint") % 1000000000L) * 4).as("log_pos"))

  /** The FullRefreshRunner analog end-to-end: snapshot rows → refresh
    * envelopes THROUGH THE REAL CHAIN (whitelist → T4 retarget →
    * blacklist → explode → degenerate registry → images → transforms →
    * envelope). Snapshot traffic is not a parallel code path — it is the
    * same declarative operator chain incremental traffic runs, entered
    * one stage earlier; a consumer unions this with the incremental
    * envelope and materializes (t13b) to bootstrap-then-follow. */
  def ingest(snapshot: DataFrame, database: String, baseTable: String,
      keyCol: String, valueCol: String, fileSeq: Long = 1L): DataFrame = {
    val frame = refreshFrame(snapshot, database, baseTable, keyCol, valueCol,
      fileSeq)
    val filtered =
      CdcOps.blacklistFilter(CdcOps.retarget(CdcOps.whitelist(frame)))
    val rows = CdcOps.explodeRows(filtered)
    // The registry of a SINGLE-table snapshot is degenerate — one row,
    // (schema_id 1, pii-by-table) — so it attaches as literals. Running
    // the generic registry+enrich here instead builds a window over one
    // row and a join whose keys are both constants, which Catalyst
    // degrades to a BroadcastNestedLoopJoin (caught by the t04c
    // PlanSpec audit); same values, worse plan. A multi-table bootstrap
    // is one `ingest` call per table, exactly like the reference runs
    // one FullRefreshRunner per table.
    val enriched = rows
      .withColumn("schema_id", lit(1))
      .withColumn("contains_pii",
        lit(CdcSqlFragments.PII_TABLES.contains(baseTable)))
    CdcOps.envelope(CdcOps.typeTransforms(CdcOps.images(enriched)))
  }
}
