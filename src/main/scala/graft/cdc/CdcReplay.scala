package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic replay of the driver `events` table as a MySQL-binlog-shaped
  * CDC stream (reference: Yelp/mysql_streamer; see SURVEY.md §1-2).
  *
  * The reference consumes a row-based-replication binlog: an ordered stream of
  * Gtid/Query(DDL)/Write/Update/DeleteRows events, each tagged with a
  * (log_file, log_pos) position (reference
  * `components/low_level_binlog_stream_reader_wrapper.py:51-161`,
  * `util/misc.py:55-87`). We derive an equivalent event stream purely
  * arithmetically from `events.parquet` so that every downstream operator is
  * checkable against a DuckDB oracle running the same mapping in SQL.
  *
  * Every scalar mapping below is written once as a SQL fragment that is valid
  * in BOTH Spark SQL and DuckDB ([[CdcSqlFragments]]) — the Spark side
  * evaluates it with `expr(...)` (still Catalyst-compiled / codegen'd), the
  * oracle interpolates the identical text. That removes dialect drift as a
  * source of hash mismatch.
  */
object CdcSqlFragments {
  /** props is a tiny JSON doc of shape {"k": <int>}; extract k without JSON
    * functions (DuckDB's json extension may not be loadable offline). */
  val K: String =
    """CAST(replace(replace(props, '{"k": ', ''), '}', '') AS INT)"""

  /** Binlog event-kind classification. `other` stands in for the event types
    * the reference's `only_events` pushdown filter excludes (rotate/format/
    * xid; reference low_level_binlog_stream_reader_wrapper.py:151-161). */
  val KIND: String =
    """CASE WHEN event_type = 'error' AND k % 5 = 4 THEN 'other'
       WHEN event_type = 'error' THEN 'ddl'
       WHEN event_type = 'view' THEN 'heartbeat'
       ELSE 'data' END"""

  /** WriteRows/UpdateRows/DeleteRows → create/update/delete
    * (reference low_level_binlog_stream_reader_wrapper.py:44-48). */
  val MSG: String =
    """CASE event_type WHEN 'signup' THEN 'create'
       WHEN 'purchase' THEN 'update'
       WHEN 'click' THEN 'delete' ELSE NULL END"""

  /** Source database; heartbeats live in yelp_heartbeat (reference
    * util/misc.py:35); a slice of traffic lands in blacklisted schemas so the
    * T8 filter is observable. */
  val DB: String =
    """CASE WHEN event_type = 'view' THEN 'yelp_heartbeat'
       WHEN user_id % 17 = 0 THEN 'mysql'
       WHEN user_id % 17 = 1 THEN 'test'
       ELSE 'db' || CAST(user_id % 3 AS STRING) END"""

  val BASE_TABLE: String =
    """CASE WHEN event_type = 'view' THEN 'replication_heartbeat'
       ELSE 't' || CAST(user_id % 5 AS STRING) END"""

  /** One refresh row per 10 (reference `<table>_data_pipeline_refresh`
    * convention, low_level_binlog_stream_reader_wrapper.py:78-94). */
  val IS_REFRESH: String = """kind = 'data' AND k % 10 = 0"""

  val LOG_FILE: String =
    """'binlog.' || lpad(CAST(CAST(floor(event_id / 1000) AS BIGINT) AS STRING), 6, '0')"""

  val LOG_POS: String = """(event_id % 1000) * 4 + 4"""

  /** Rows-per-RowsEvent (a binlog RowsEvent packs N row images; reference
    * low_level_binlog_stream_reader_wrapper.py:100-135). */
  val N_ROWS_MINUS_1: String = """k % 3"""

  val REFRESH_SUFFIX = "_data_pipeline_refresh"
  val CLUSTER = "refcluster"

  /** Synthetic DDL text for QueryEvents (kind='ddl'), spanning the
    * statement classes the reference's sql_handler distinguishes
    * (components/sql_handler.py:306-462). Valid in both dialects. */
  val DDL_STMT: String =
    """CASE k % 8
       WHEN 0 THEN 'CREATE TABLE `' || database_name || '`.`' || base_table || '` (id INT PRIMARY KEY, name VARCHAR(64))'
       WHEN 1 THEN 'ALTER TABLE ' || base_table || ' ADD location VARCHAR(128) DEFAULT NULL'
       WHEN 2 THEN 'ALTER TABLE `' || base_table || '` RENAME TO `' || base_table || '_v2`'
       WHEN 3 THEN 'RENAME TABLE `' || base_table || '` TO `' || base_table || '_new`'
       WHEN 4 THEN 'DROP TABLE IF EXISTS "' || base_table || '"'
       WHEN 5 THEN 'CREATE DATABASE IF NOT EXISTS ' || database_name
       WHEN 6 THEN 'BEGIN'
       ELSE 'INSERT INTO ' || base_table || ' VALUES (1)' END"""

  /** DDLs that clear the schema cache (RENAME flavors; reference
    * schema_event_handler.py:114-121). */
  val IS_RENAME_DDL: String = """kind = 'ddl' AND k % 8 IN (2, 3)"""

  /** DDLs that bump a table's schema version (ALTER flavors; reference
    * schema_event_handler.py:154-175). */
  val IS_ALTER_DDL: String = """kind = 'ddl' AND k % 8 IN (1, 2)"""

  /** GTID mode (reference util/position.py:50-107): the cluster's server
    * uuid is fixed; we model one transaction per 4 binlog events, so the
    * transaction counter is a pure function of the monotone event_id. */
  val GTID_SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
  val GTID_TXN: String = "CAST(floor(event_id / 4) AS BIGINT) + 1"

  /** Schema blacklist (reference config.yaml:17-22). */
  val BLACKLIST: Seq[String] =
    Seq("information_schema", "mysql", "performance_schema", "test", "yelp_heartbeat")

  /** Table whitelist — t4 deliberately NOT whitelisted (reference
    * `--table-whitelist`, low_level_binlog_stream_reader_wrapper.py:61,78-94). */
  val WHITELIST: Seq[String] = Seq("t0", "t1", "t2", "t3")

  /** Tables flagged PII by the static ruleset (reference
    * components/schema_wrapper.py:64-77). */
  val PII_TABLES: Seq[String] = Seq("t1", "t3")

  def sqlList(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString("(", ", ", ")")
}

object CdcReplay {
  import CdcSqlFragments._

  /** events (with ts_us µs long, see [[graft.Tables.events]]) → CDC frame.
    * Columns: event_id, ts_us, user_id, value, k, kind, message_type,
    * database_name, base_table, is_refresh, table_name, log_file, log_pos,
    * hb_serial.
    */
  def fromEvents(events: DataFrame): DataFrame =
    events
      .withColumn("k", expr(K))
      .withColumn("kind", expr(KIND))
      .withColumn("message_type", expr(MSG))
      .withColumn("database_name", expr(DB))
      .withColumn("base_table", expr(BASE_TABLE))
      .withColumn("is_refresh", expr(IS_REFRESH))
      .withColumn("table_name",
        when(col("is_refresh"), concat(col("base_table"), lit(REFRESH_SUFFIX)))
          .otherwise(col("base_table")))
      .withColumn("log_file", expr(LOG_FILE))
      .withColumn("log_pos", expr(LOG_POS))
      // Heartbeat serial is monotone in the binlog (reference
      // testing_helper/util.py:80-89); event_id is our monotone clock.
      .withColumn("hb_serial", when(col("kind") === "heartbeat", col("event_id")))
      .drop("props", "event_type")
}
