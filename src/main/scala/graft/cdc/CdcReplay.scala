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

  // ---- MySQL type matrix (reference tests/integration/end_to_end_test.py:
  // 77-196: the complex-table fidelity fixture). The replay has no such
  // columns, so each family is DERIVED arithmetically from the row image
  // (payload_id/payload_k/payload_value) spanning the type's full range
  // incl. its boundaries, then carried through the output transforms the
  // reference applies (util/message_builder.py:90-107). Every fragment
  // below is valid VERBATIM in both Spark SQL and DuckDB — dialect-split
  // pieces (date arith, µs→ISO, blob cast) live in CdcOps/CdcOracle.

  // int family: signed ranges spanned exactly; unsigned upcast one width
  // (TINYINT/SMALLINT → INT, INT → BIGINT — the catalog's mysqlType rule)
  val TM_TINY = "CAST((payload_id * 37) % 256 - 128 AS TINYINT)"
  val TM_UTINY = "CAST((payload_id * 37) % 256 AS INT)"
  val TM_SMALL = "CAST((payload_id * 7919) % 65536 - 32768 AS SMALLINT)"
  val TM_USMALL = "CAST((payload_id * 7919) % 65536 AS INT)"
  val TM_MED = "CAST((payload_id * 104729) % 16777216 - 8388608 AS INT)"
  val TM_INT = "CAST((payload_id * 2654435761) % 4294967296 - 2147483648 AS INT)"
  val TM_UINT = "CAST((payload_id * 2654435761) % 4294967296 AS BIGINT)"
  val TM_BIG_HI = "9223372036854775807 - CAST(payload_k AS BIGINT)"
  val TM_BIG_LO = "CAST(-9223372036854775807 AS BIGINT) - 1 + CAST(payload_k AS BIGINT)"

  // DECIMAL(p,s) exactness: built from integer unscaled parts via string
  // (never float arithmetic), terminal CAST pins precision+scale in both
  // engines — DECIMAL values compare bit-exact, the reference's DECIMAL
  // round-trip promise
  private def decimalFrag(unscaled: String, intDiv: Long, fracDigits: Int, p: Int, s: Int) =
    s"""CAST(CASE WHEN payload_k % 2 = 1 THEN '-' ELSE '' END ||
       CAST(CAST((($unscaled) - ($unscaled) % $intDiv) / $intDiv AS BIGINT) AS STRING) ||
       '.' || lpad(CAST(($unscaled) % $intDiv AS STRING), $fracDigits, '0')
       AS DECIMAL($p,$s))"""
  val TM_DEC92: String =
    decimalFrag("(payload_id * 48611 + payload_k * 13) % 1000000000", 100L, 2, 9, 2)
  val TM_DEC1211: String =
    decimalFrag("(payload_id * 9999999967 + payload_k) % 1000000000000", 100000000000L, 11, 12, 11)
  // unsigned BIGINT boundary: 18446744073709551615 does not fit int64 —
  // DECIMAL(20,0), the catalog's BIGINT UNSIGNED mapping
  val TM_UBIG =
    """CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) -
       CAST(payload_k AS DECIMAL(20,0)) AS DECIMAL(20,0))"""
  val TM_F32 = "CAST(payload_value AS FLOAT)"

  // temporal family: DATE spanning 1901..2051, DATETIME(6) µs over the
  // 32-bit epoch range, TIME(6) µs-of-day incl. 23:59:59.999999, YEAR
  val TM_DAYS = "CAST((payload_id * 53) % 54787 AS INT)"
  /** seconds spanning the full 32-bit epoch range (to 2038-01-19) composed
    * with a separate µs part — a single multiplier would need to overflow
    * int64 to wrap the 2^31·10^6 modulus. */
  val TM_US6 =
    "((payload_id * 2654435761) % 2147483647) * 1000000 + (payload_id * 999983) % 1000000"
  val TM_TIME6 = "((payload_id % 100000) * 86399999999) % 86400000000"
  val TM_YEAR = "CAST(1901 + (payload_id * 13) % 155 AS INT)"
  /** MySQL zero-dates ('0000-00-00...') arrive from the binlog reader as
    * NULL (pymysqlreplication converts unrepresentable dates) — model the
    * raw wire string alongside the NULLed output. */
  val TM_IS_ZERO = "payload_k % 11 = 0"

  // char/text family + ENUM (SET is t11's tags_sorted)
  val TM_CH = "substr('abcdefghij', 1, CAST(payload_k % 11 AS INT))"
  val TM_ENUM = "CASE payload_k % 3 WHEN 0 THEN 'ONE' WHEN 1 THEN 'TWO' ELSE 'THREE' END"

  // ---- gate-safe re-projections of the matrix columns (exactness house
  // rule: never emit live DECIMAL/FLOAT/BINARY through the hash gate —
  // the driver compares through pandas, which coerces DECIMAL to float64
  // (DECIMAL(20,0) ≈ 1.8e19 and 11 fraction digits are unrepresentable)
  // and cannot sort raw bytes). The re-projections stay bit-exact: the
  // unscaled BIGINT fully determines a fixed-scale DECIMAL; DECIMAL(20,0)
  // exceeds int64 so it travels as its exact digit string (scale 0 never
  // prints scientific); float32→float64 widening is exact by IEEE-754
  // construction; bytes travel as upper-hex. Native DECIMAL/FLOAT/BINARY
  // fidelity stays covered by AvroEnvelopeSpec and t12c's wire round trip
  // (which re-projects only AFTER decode). Verbatim-valid in both dialects;
  // the fractional parts below are exactly .00/.00000000000 so the terminal
  // integer cast never rounds.
  val GM_DEC92 = "CAST(dec_9_2 * 100 AS BIGINT)"
  val GM_DEC1211 = "CAST(dec_12_11 * 100000000000 AS BIGINT)"
  val GM_UBIG = "CAST(ubig_20 AS STRING)"
  val GM_F32 = "CAST(f32 AS DOUBLE)"
  val GM_BIN = "upper(hex(bin))"
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
