package graft.cdc

/** DuckDB-dialect oracle for the CDC operator chain. The WITH-prologue
  * mirrors [[CdcReplay]]/[[CdcOps]] stage by stage; scalar mappings are the
  * SAME strings ([[CdcSqlFragments]]) the Spark side compiles via expr().
  * `epoch_us(ts)` accepts either historical encoding of `events.ts`
  * (TIMESTAMP(NANOS) truncated to µs at read, or native TIMESTAMP_MICROS)
  * and equals the Spark side's dtype-branched `ts_us` — see
  * [[graft.Tables.events]].
  */
object CdcOracle {
  import CdcSqlFragments._

  val prologue: String = s"""
WITH base AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value, $K AS k, event_type
  FROM events
), cdc0 AS (
  SELECT *, $KIND AS kind, $MSG AS message_type, $DB AS database_name,
         $BASE_TABLE AS base_table, $LOG_FILE AS log_file, $LOG_POS AS log_pos
  FROM base
), cdc AS (
  SELECT *, ($IS_REFRESH) AS is_refresh,
         CASE WHEN $IS_REFRESH THEN base_table || '$REFRESH_SUFFIX' ELSE base_table END AS table_name,
         CASE WHEN kind = 'heartbeat' THEN event_id ELSE NULL END AS hb_serial
  FROM cdc0
), admitted AS (
  SELECT * FROM cdc WHERE kind <> 'other'
), datas AS (
  SELECT * FROM admitted WHERE kind = 'data'
), whitelisted AS (
  SELECT * FROM datas WHERE base_table IN ${sqlList(WHITELIST)}
), retargeted AS (
  SELECT *, base_table AS target_table,
         CASE WHEN is_refresh THEN 'refresh' ELSE message_type END AS out_message_type
  FROM whitelisted
), filtered AS (
  SELECT * FROM retargeted WHERE database_name NOT IN ${sqlList(BLACKLIST)}
), rows0 AS (
  SELECT f.*, unnest(generate_series(0, f.k % 3)) AS ridx FROM filtered f
), rows1 AS (
  SELECT *, CAST(ridx AS INT) AS row_idx FROM rows0
), rws AS (
  SELECT *, event_id * 10 + row_idx AS payload_id,
         value + row_idx AS payload_value,
         k + row_idx AS payload_k
  FROM rows1
), registry AS (
  SELECT database_name, target_table,
         CAST(dense_rank() OVER (ORDER BY database_name, target_table) AS INT) AS schema_id,
         target_table IN ${sqlList(PII_TABLES)} AS contains_pii
  FROM (SELECT DISTINCT database_name, target_table FROM filtered) dt
), enriched AS (
  SELECT r.*, g.schema_id, g.contains_pii
  FROM rws r JOIN registry g USING (database_name, target_table)
), imaged AS (
  SELECT *,
    CASE WHEN out_message_type = 'update' THEN payload_id ELSE NULL END AS prev_id,
    CASE WHEN out_message_type = 'update' THEN payload_value - 1.0 ELSE NULL END AS prev_value,
    CASE WHEN out_message_type = 'update' THEN payload_k - 1 ELSE NULL END AS prev_k
  FROM enriched
), transformed AS (
  SELECT *,
    strftime(make_timestamp(ts_us), '%Y-%m-%dT%H:%M:%S.%f') AS ts_iso,
    ts_us % 86400000000 AS time_of_day_us,
    array_to_string(list_sort(string_split(${CdcOps.TAGS_CASE}, ',')), ',') AS tags_sorted
  FROM imaged
), envelope AS (
  SELECT 'refcluster' AS cluster_name, database_name,
    target_table AS table_name, out_message_type AS message_type,
    log_file, log_pos, row_idx AS pos_offset, ts_us, schema_id, contains_pii,
    payload_id, payload_value, payload_k, tags_sorted, ts_iso, time_of_day_us,
    prev_id, prev_value, prev_k,
    'refcluster' || ':' || log_file || ':' || CAST(log_pos AS STRING) AS transaction_id,
    database_name || '.' || target_table AS topic,
    log_file || ':' || lpad(CAST(log_pos AS STRING), 10, '0') || ':' || lpad(CAST(row_idx AS STRING), 4, '0') AS pos_key,
    event_id, row_idx, k
  FROM transformed
), ddls AS (
  SELECT *, $DDL_STMT AS stmt FROM admitted WHERE kind = 'ddl'
), epochs AS (
  SELECT *, CAST(sum(CASE WHEN $IS_RENAME_DDL THEN 1 ELSE 0 END)
    OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cache_epoch
  FROM admitted
), versions AS (
  SELECT *, CAST(1 + sum(CASE WHEN $IS_ALTER_DDL THEN 1 ELSE 0 END)
    OVER (PARTITION BY database_name, base_table ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS schema_version
  FROM admitted
), matrix AS (
  SELECT event_id, row_idx,
    $TM_TINY AS tiny_s, $TM_UTINY AS tiny_u,
    $TM_SMALL AS small_s, $TM_USMALL AS small_u,
    $TM_MED AS medium_s, $TM_INT AS int_s,
    $TM_UINT AS int_u, $TM_BIG_HI AS big_hi, $TM_BIG_LO AS big_lo,
    $TM_DEC92 AS dec_9_2, $TM_DEC1211 AS dec_12_11,
    $TM_UBIG AS ubig_20, $TM_F32 AS f32,
    DATE '1901-01-01' + $TM_DAYS AS d_date,
    strftime(make_timestamp($TM_US6), '%Y-%m-%dT%H:%M:%S.%f') AS dt6_iso,
    $TM_TIME6 AS time6_us, $TM_YEAR AS yr,
    CASE WHEN $TM_IS_ZERO THEN '0000-00-00 00:00:00'
         ELSE strftime(make_timestamp($TM_US6), '%Y-%m-%d %H:%M:%S') END AS dt_wire,
    CASE WHEN $TM_IS_ZERO THEN NULL
         ELSE strftime(make_timestamp($TM_US6), '%Y-%m-%d %H:%M:%S') END AS dt_out,
    $TM_CH AS ch,
    $TM_CH || '-' || CAST(payload_id AS STRING) AS vch,
    CAST($TM_CH AS BLOB) AS bin,
    $TM_ENUM AS enum_v
  FROM rws
), numbered AS (
  SELECT *, CAST(row_number() OVER (ORDER BY pos_key) AS BIGINT) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS cnt,
         CAST(row_number() OVER (PARTITION BY topic ORDER BY pos_key) AS BIGINT) AS seq
  FROM envelope
), cutoff AS (
  SELECT pos_key AS saved_pos, rn AS saved_rn, log_file AS saved_file
  FROM numbered WHERE rn = CAST(floor(cnt * 0.6) AS BIGINT)
), kafka_cutoff AS (
  SELECT pos_key AS kafka_pos FROM numbered WHERE rn = CAST(floor(cnt * 0.65) AS BIGINT)
), saved_offsets AS (
  SELECT topic, CAST(count(*) AS BIGINT) AS saved_n
  FROM numbered, kafka_cutoff WHERE pos_key <= kafka_pos GROUP BY topic
), candidates AS (
  SELECT n.* FROM numbered n, cutoff c
  WHERE n.rn > c.saved_rn AND n.rn <= c.saved_rn + 1500
), hbs AS (
  SELECT event_id AS serial, ts_us, log_file, log_pos,
         CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS hb_rn,
         CAST(count(*) OVER () AS BIGINT) AS hb_cnt
  FROM cdc WHERE kind = 'heartbeat'
), hb_target AS (
  SELECT serial AS target_serial FROM hbs WHERE hb_rn = CAST(floor(hb_cnt / 2.0) AS BIGINT)
), hb_files AS (
  SELECT log_file, min(serial) AS first_serial FROM hbs GROUP BY log_file
)
"""

  /** Wrap a final SELECT with the full prologue (DuckDB prunes unused CTEs). */
  def q(finalSelect: String): String = prologue + finalSelect
}
