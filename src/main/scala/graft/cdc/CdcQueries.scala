package graft.cdc

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named intermediate frames of the CDC chain, built lazily per query.
  *
  * The fully-built envelope is a session-shared pay-once artifact
  * ([[graft.data.SharedFrames]], same contract as the dedup chain): the
  * reference parses the replication stream ONCE and fans the built
  * messages out to every consumer (publish, checkpoint, stats), so
  * t12/t12b/t13b/t26/t27/t31 reading one materialized envelope is the
  * deployment model, not a bench trick — each still applies its own
  * projection/aggregation, and the oracle checks are unchanged. */
final class CdcChain(spark: SparkSession, sfDir: String) {
  lazy val cdc: DataFrame = CdcReplay.fromEvents(Tables.events(spark, sfDir))
  lazy val admitted: DataFrame = CdcOps.admit(cdc)
  lazy val datas: DataFrame = CdcOps.dataOnly(admitted)
  lazy val whitelisted: DataFrame = CdcOps.whitelist(datas)
  lazy val retargeted: DataFrame = CdcOps.retarget(whitelisted)
  lazy val filtered: DataFrame = CdcOps.blacklistFilter(retargeted)
  lazy val rows: DataFrame = CdcOps.explodeRows(filtered)
  lazy val reg: DataFrame = CdcOps.registry(filtered)
  lazy val enriched: DataFrame = CdcOps.enrich(rows, reg)
  lazy val imaged: DataFrame = CdcOps.images(enriched)
  lazy val transformed: DataFrame = CdcOps.typeTransforms(imaged)
  lazy val env: DataFrame =
    graft.data.SharedFrames.memo(cdc, "cdc-envelope")(
      CdcOps.envelope(transformed))
  lazy val intervals: DataFrame = CdcOps.schemaIntervals(admitted)
  lazy val evolved: DataFrame = CdcOps.evolvePayload(env, intervals)
  lazy val matrix: DataFrame = CdcOps.typeMatrix(rows)
}

/** One oracle-checked query per data-plane operator (SURVEY §2 T1-T19).
  * Column names and row order match the DuckDB oracle exactly.
  */
object CdcQueries {
  import CdcSqlFragments._

  private def c(fn: CdcChain => DataFrame): (SparkSession, String) => DataFrame =
    (spark, sfDir) => fn(new CdcChain(spark, sfDir))

  val envelopeCols: Seq[String] = Seq(
    "cluster_name", "database_name", "table_name", "message_type",
    "log_file", "log_pos", "pos_offset", "ts_us", "schema_id", "contains_pii",
    "payload_id", "payload_value", "payload_k", "tags_sorted", "ts_iso",
    "time_of_day_us", "prev_id", "prev_value", "prev_k",
    "transaction_id", "topic", "pos_key", "event_id", "row_idx")

  private val expandedWhitelist: Seq[String] =
    WHITELIST ++ WHITELIST.map(_ + REFRESH_SUFFIX)

  /** The full type matrix in its gate-safe form (alias → fragment, each
    * fragment verbatim-valid in both dialects; see the GM_* scaladoc in
    * [[CdcSqlFragments]]): DECIMALs as unscaled BIGINTs / digit string,
    * FLOAT widened exactly to DOUBLE, BINARY as upper-hex. Used by t12c
    * (applied AFTER the Avro decode) and mirrored by its oracle. */
  val matrixGate: Seq[(String, String)] = Seq(
    "event_id" -> "event_id", "row_idx" -> "row_idx",
    "tiny_s" -> "tiny_s", "tiny_u" -> "tiny_u",
    "small_s" -> "small_s", "small_u" -> "small_u",
    "medium_s" -> "medium_s", "int_s" -> "int_s", "int_u" -> "int_u",
    "big_hi" -> "big_hi", "big_lo" -> "big_lo",
    "dec92_unscaled" -> GM_DEC92, "dec1211_unscaled" -> GM_DEC1211,
    "ubig_20_str" -> GM_UBIG, "f32_wide" -> GM_F32,
    "d_date" -> "d_date", "dt6_iso" -> "dt6_iso",
    "time6_us" -> "time6_us", "yr" -> "yr",
    "dt_wire" -> "dt_wire", "dt_out" -> "dt_out",
    "ch" -> "ch", "vch" -> "vch",
    "bin_hex" -> GM_BIN, "enum_v" -> "enum_v")

  private def gateSelect(entries: Seq[(String, String)]): String =
    entries.map { case (alias, frag) =>
      if (alias == frag) alias else s"$frag AS $alias"
    }.mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_cdc_source" -> c(_.cdc
      .select("event_id", "kind", "database_name", "table_name", "log_file", "log_pos")
      .orderBy("event_id")),
    "t02_event_filter" -> c(_.admitted
      .select("event_id", "kind").orderBy("event_id")),
    "t03_table_whitelist" -> c(_.datas
      .filter(col("table_name").isin(expandedWhitelist: _*))
      .select("event_id", "table_name").orderBy("event_id")),
    "t04_refresh_retarget" -> c(_.retargeted
      .filter(col("is_refresh"))
      .select(col("event_id"), col("table_name").as("source_table"),
        col("target_table"), col("out_message_type"))
      .orderBy("event_id")),
    // T4b — the initial bulk snapshot (FullRefreshRunner analog): a
    // partitioned-scan stand-in (customer parquet for the JDBC read)
    // bulk-copied through the refresh shadow table and the REAL chain —
    // every row comes out as one refresh-typed envelope. See
    // [[JdbcSnapshot]].
    "t04b_snapshot_ingest" -> ((spark: SparkSession, sfDir: String) =>
      JdbcSnapshot.ingest(Tables.load(spark, sfDir, "customer"),
          "db0", "t1", "c_custkey", "c_acctbal")
        .select(envelopeCols.map(col): _*)
        .orderBy("event_id", "row_idx")),
    // T4c — the bootstrap COMPLETION: snapshot envelope ∪ incremental
    // changelog, materialized t13b-style. The snapshot seeds every source
    // row; any incremental change to the same (db, table, payload_id)
    // with a later pos_key wins; deletes tombstone. Cross-stream pos_key
    // ties are impossible by construction (snapshot pos = 4·key in file
    // binlog.000001; replay pos = 4·(event_id % 1000) + 4 in file
    // binlog.⌊event_id/1000⌋ — equal (file, pos) has no solution), so
    // max_by is deterministic.
    "t04c_bootstrap_materialize" -> ((spark: SparkSession, sfDir: String) => {
      val snap = JdbcSnapshot.ingest(Tables.load(spark, sfDir, "customer"),
          "db0", "t1", "c_custkey", "c_acctbal")
        .select(envelopeCols.map(col): _*)
      val env = new CdcChain(spark, sfDir).env
        .select(envelopeCols.map(col): _*)
      snap.unionByName(env)
        .groupBy("database_name", "table_name", "payload_id")
        .agg(
          max("pos_key").as("last_pos"),
          expr("max_by(message_type, pos_key)").as("last_type"),
          expr("max_by(payload_value, pos_key)").as("payload_value"),
          expr("max_by(payload_k, pos_key)").as("payload_k"),
          count(lit(1)).as("n_versions"))
        .filter(col("last_type") =!= "delete")
        .orderBy("database_name", "table_name", "payload_id")
    }),
    "t05_heartbeat_beacons" -> c(_.cdc
      .filter(col("kind") === "heartbeat")
      .select(col("event_id").as("serial"), col("ts_us").as("hb_ts_us"),
        col("log_file"), col("log_pos"))
      .orderBy("serial")),
    "t06_rows_explode" -> c(_.rows
      .select("event_id", "row_idx", "payload_id")
      .orderBy("event_id", "row_idx")),
    "t07_classify" -> c(_.retargeted
      .select(col("event_id"), col("out_message_type").as("message_type"))
      .orderBy("event_id")),
    "t08_blacklist" -> c(_.filtered
      .select("event_id", "database_name").orderBy("event_id")),
    "t09_after_image" -> c(_.rows
      .select("event_id", "row_idx", "payload_id", "payload_value", "payload_k")
      .orderBy("event_id", "row_idx")),
    "t10_before_image" -> c(_.imaged
      .filter(col("out_message_type") === "update")
      .select("event_id", "row_idx", "prev_id", "prev_value", "prev_k")
      .orderBy("event_id", "row_idx")),
    "t11_type_transforms" -> c(_.transformed
      .select("event_id", "row_idx", "ts_iso", "time_of_day_us", "tags_sorted")
      .orderBy("event_id", "row_idx")),
    "t12_envelope" -> c(_.env
      .select(envelopeCols.map(col): _*)
      .orderBy("event_id", "row_idx")),
    "t12b_avro_roundtrip" -> c(ch => AvroEnvelope.roundTrip(ch.env)
      .orderBy("event_id", "row_idx")),
    // T12c — the type matrix through the Avro wire format: equality with
    // the matrix oracle proves decimal/date/binary logical types survive
    // encode→decode bit-exactly. The round trip runs on the NATIVE
    // DECIMAL/FLOAT/BINARY columns (that is the point); only the compared
    // projection afterwards applies the gate-safe re-projections
    // ([[CdcSqlFragments.GM_DEC92]] etc.) per the exactness house rule.
    "t12c_avro_matrix" -> c(ch => AvroEnvelope.roundTripGeneric(ch.matrix)
      .select(matrixGate.map { case (alias, frag) => expr(frag).as(alias) }: _*)
      .orderBy("event_id", "row_idx")),
    "t13_changelog" -> c(_.env
      .select("database_name", "table_name", "payload_id")
      .orderBy("database_name", "table_name", "payload_id")),
    // The canonical downstream consumer of the reference's output stream:
    // materialize current table state from the changelog. One hash
    // aggregation keyed by row identity; max_by picks the latest image by
    // the total per-row order (pos_key is unique), deletes drop the row.
    // At 100 TB this is the exact shape of a Debezium-consumer snapshot
    // build: no window, no sort, map-side partial max_by aggregation.
    "t13b_materialize" -> c(_.env
      .groupBy("database_name", "table_name", "payload_id")
      .agg(
        max("pos_key").as("last_pos"),
        expr("max_by(message_type, pos_key)").as("last_type"),
        expr("max_by(payload_value, pos_key)").as("payload_value"),
        expr("max_by(payload_k, pos_key)").as("payload_k"),
        count(lit(1)).as("n_versions"))
      .filter(col("last_type") =!= "delete")
      .orderBy("database_name", "table_name", "payload_id")),
    "t14_transaction_id" -> c(_.env
      .select("event_id", "row_idx", "transaction_id", "cluster_name", "log_file", "log_pos")
      .orderBy("event_id", "row_idx")),
    "t15_dry_run" -> c(_.env
      .select(col("event_id"), col("row_idx"), lit(1).as("schema_id"))
      .orderBy("event_id", "row_idx")),
    "t16_registry_join" -> c(_.env
      .select("event_id", "row_idx", "database_name", "table_name", "schema_id")
      .orderBy("event_id", "row_idx")),
    "t18_pii_flags" -> c(_.reg
      .select(col("database_name"), col("target_table").as("table_name"),
        col("schema_id"), col("contains_pii"))
      .orderBy("schema_id")),
    "t19_event_routing" -> c(_.admitted
      .groupBy("kind").agg(count(lit(1)).as("n"))
      .orderBy("kind")),
    // T11b-e — MySQL type-matrix fidelity (SURVEY §7.4 risk 4; reference
    // end_to_end_test.py:77-196), one oracle row per type family.
    "t11b_int_matrix" -> c(_.matrix
      .select("event_id", "row_idx", "tiny_s", "tiny_u", "small_s", "small_u",
        "medium_s", "int_s", "int_u", "big_hi", "big_lo")
      .orderBy("event_id", "row_idx")),
    // T11c — DECIMAL/FLOAT exactness through the gate-safe re-projection
    // (unscaled BIGINTs, digit string for the DECIMAL(20,0) boundary,
    // exact f32→f64 widening); the live DECIMAL columns themselves are
    // covered by AvroEnvelopeSpec + t12c's wire round trip.
    "t11c_decimal_exact" -> c(_.matrix
      .select(col("event_id"), col("row_idx"),
        expr(GM_DEC92).as("dec92_unscaled"),
        expr(GM_DEC1211).as("dec1211_unscaled"),
        expr(GM_UBIG).as("ubig_20_str"),
        expr(GM_F32).as("f32_wide"))
      .orderBy("event_id", "row_idx")),
    "t11d_temporal_matrix" -> c(_.matrix
      .select("event_id", "row_idx", "d_date", "dt6_iso", "time6_us", "yr",
        "dt_wire", "dt_out")
      .orderBy("event_id", "row_idx")),
    // T11e — BINARY travels as upper-hex (the gate cannot sort raw bytes).
    "t11e_char_binary_enum" -> c(_.matrix
      .select(col("event_id"), col("row_idx"), col("ch"), col("vch"),
        expr(GM_BIN).as("bin_hex"), col("enum_v"))
      .orderBy("event_id", "row_idx")),
    // T22b — the payload's column set follows the table's DDL-evolved
    // schema version as of each row's position (SURVEY §7.4 risk 1).
    "t22b_evolved_payload" -> c(_.evolved
      .select("event_id", "row_idx", "database_name", "table_name",
        "schema_version", "payload_json")
      .orderBy("event_id", "row_idx"))
  )

  import CdcOracle.q

  val oracle: Map[String, String] = Map(
    "t01_cdc_source" -> q(
      "SELECT event_id, kind, database_name, table_name, log_file, log_pos FROM cdc ORDER BY event_id"),
    "t02_event_filter" -> q(
      "SELECT event_id, kind FROM admitted ORDER BY event_id"),
    "t03_table_whitelist" -> q(
      s"SELECT event_id, table_name FROM datas WHERE table_name IN ${sqlList(expandedWhitelist)} ORDER BY event_id"),
    "t04_refresh_retarget" -> q(
      "SELECT event_id, table_name AS source_table, target_table, out_message_type FROM retargeted WHERE is_refresh ORDER BY event_id"),
    // t04b is self-contained (its source is the customer snapshot, not
    // the events replay), mirroring [[JdbcSnapshot.refreshFrame]]'s
    // derivations and the chain stages the ingest actually runs.
    "t04b_snapshot_ingest" -> s"""
WITH snap AS (
  SELECT CAST(c_custkey AS BIGINT) AS event_id,
         1700000000000000 + CAST(c_custkey AS BIGINT) AS ts_us,
         CAST(c_acctbal AS DOUBLE) AS value,
         CAST((CAST(c_custkey AS BIGINT) % 100000) * 3 AS INT) AS k,
         'binlog.000001' AS log_file,
         (CAST(c_custkey AS BIGINT) % 1000000000) * 4 AS log_pos
  FROM customer
), rows0 AS (
  SELECT s.*, unnest(generate_series(0, s.k % 3)) AS ridx FROM snap s
), rws AS (
  SELECT *, CAST(ridx AS INT) AS row_idx,
         event_id * 10 + CAST(ridx AS INT) AS payload_id,
         value + CAST(ridx AS INT) AS payload_value,
         k + CAST(ridx AS INT) AS payload_k
  FROM rows0
)
SELECT 'refcluster' AS cluster_name, 'db0' AS database_name,
  't1' AS table_name, 'refresh' AS message_type,
  log_file, log_pos, row_idx AS pos_offset, ts_us,
  CAST(1 AS INT) AS schema_id, TRUE AS contains_pii,
  payload_id, payload_value, payload_k,
  array_to_string(list_sort(string_split(${CdcOps.TAGS_CASE}, ',')), ',') AS tags_sorted,
  strftime(make_timestamp(ts_us), '%Y-%m-%dT%H:%M:%S.%f') AS ts_iso,
  ts_us % 86400000000 AS time_of_day_us,
  CAST(NULL AS BIGINT) AS prev_id, CAST(NULL AS DOUBLE) AS prev_value,
  CAST(NULL AS INT) AS prev_k,
  'refcluster' || ':' || log_file || ':' || CAST(log_pos AS STRING) AS transaction_id,
  'db0.t1' AS topic,
  log_file || ':' || lpad(CAST(log_pos AS STRING), 10, '0') || ':' || lpad(CAST(row_idx AS STRING), 4, '0') AS pos_key,
  event_id, row_idx
FROM rws ORDER BY event_id, row_idx""",
    "t05_heartbeat_beacons" -> q(
      "SELECT event_id AS serial, ts_us AS hb_ts_us, log_file, log_pos FROM cdc WHERE kind = 'heartbeat' ORDER BY serial"),
    "t06_rows_explode" -> q(
      "SELECT event_id, row_idx, payload_id FROM rws ORDER BY event_id, row_idx"),
    "t07_classify" -> q(
      "SELECT event_id, out_message_type AS message_type FROM retargeted ORDER BY event_id"),
    "t08_blacklist" -> q(
      "SELECT event_id, database_name FROM filtered ORDER BY event_id"),
    "t09_after_image" -> q(
      "SELECT event_id, row_idx, payload_id, payload_value, payload_k FROM rws ORDER BY event_id, row_idx"),
    "t10_before_image" -> q(
      "SELECT event_id, row_idx, prev_id, prev_value, prev_k FROM imaged WHERE out_message_type = 'update' ORDER BY event_id, row_idx"),
    "t11_type_transforms" -> q(
      "SELECT event_id, row_idx, ts_iso, time_of_day_us, tags_sorted FROM transformed ORDER BY event_id, row_idx"),
    "t12_envelope" -> q(
      s"SELECT ${envelopeCols.mkString(", ")} FROM envelope ORDER BY event_id, row_idx"),
    "t12b_avro_roundtrip" -> q(
      """SELECT event_id, row_idx, payload_id, payload_value, payload_k,
         message_type, tags_sorted, ts_iso, prev_id, prev_value, prev_k
         FROM envelope ORDER BY event_id, row_idx"""),
    "t13_changelog" -> q(
      "SELECT database_name, table_name, payload_id FROM envelope ORDER BY database_name, table_name, payload_id"),
    "t13b_materialize" -> q(
      """SELECT * FROM (
           SELECT database_name, table_name, payload_id,
                  max(pos_key) AS last_pos,
                  max_by(message_type, pos_key) AS last_type,
                  max_by(payload_value, pos_key) AS payload_value,
                  max_by(payload_k, pos_key) AS payload_k,
                  CAST(count(*) AS BIGINT) AS n_versions
           FROM envelope GROUP BY 1, 2, 3) m
         WHERE last_type <> 'delete'
         ORDER BY database_name, table_name, payload_id"""),
    // t04c continues the prologue's WITH chain (leading comma): snapshot
    // envelope rebuilt from customer, unioned with the replay changelog,
    // materialized exactly like t13b.
    "t04c_bootstrap_materialize" -> q(
      """, snap04 AS (
           SELECT CAST(c_custkey AS BIGINT) AS event_id,
                  CAST(c_acctbal AS DOUBLE) AS value,
                  CAST((CAST(c_custkey AS BIGINT) % 100000) * 3 AS INT) AS k,
                  'binlog.000001' AS log_file,
                  (CAST(c_custkey AS BIGINT) % 1000000000) * 4 AS log_pos
           FROM customer
         ), snaprows04 AS (
           SELECT s.*, unnest(generate_series(0, s.k % 3)) AS ridx FROM snap04 s
         ), snapenv04 AS (
           SELECT 'db0' AS database_name, 't1' AS table_name,
                  event_id * 10 + CAST(ridx AS INT) AS payload_id,
                  'refresh' AS message_type,
                  value + CAST(ridx AS INT) AS payload_value,
                  k + CAST(ridx AS INT) AS payload_k,
                  log_file || ':' || lpad(CAST(log_pos AS STRING), 10, '0') || ':' || lpad(CAST(ridx AS STRING), 4, '0') AS pos_key
           FROM snaprows04
         ), boot04 AS (
           SELECT database_name, table_name, payload_id, message_type,
                  payload_value, payload_k, pos_key FROM snapenv04
           UNION ALL
           SELECT database_name, table_name, payload_id, message_type,
                  payload_value, payload_k, pos_key FROM envelope
         )
         SELECT * FROM (
           SELECT database_name, table_name, payload_id,
                  max(pos_key) AS last_pos,
                  max_by(message_type, pos_key) AS last_type,
                  max_by(payload_value, pos_key) AS payload_value,
                  max_by(payload_k, pos_key) AS payload_k,
                  CAST(count(*) AS BIGINT) AS n_versions
           FROM boot04 GROUP BY 1, 2, 3) m
         WHERE last_type <> 'delete'
         ORDER BY database_name, table_name, payload_id"""),
    "t14_transaction_id" -> q(
      "SELECT event_id, row_idx, transaction_id, cluster_name, log_file, log_pos FROM envelope ORDER BY event_id, row_idx"),
    "t15_dry_run" -> q(
      "SELECT event_id, row_idx, CAST(1 AS INT) AS schema_id FROM envelope ORDER BY event_id, row_idx"),
    "t16_registry_join" -> q(
      "SELECT event_id, row_idx, database_name, table_name, schema_id FROM envelope ORDER BY event_id, row_idx"),
    "t18_pii_flags" -> q(
      "SELECT database_name, target_table AS table_name, schema_id, contains_pii FROM registry ORDER BY schema_id"),
    "t19_event_routing" -> q(
      "SELECT kind, CAST(count(*) AS BIGINT) AS n FROM admitted GROUP BY kind ORDER BY kind"),
    "t12c_avro_matrix" -> q(
      s"SELECT ${gateSelect(matrixGate)} FROM matrix ORDER BY event_id, row_idx"),
    "t11b_int_matrix" -> q(
      """SELECT event_id, row_idx, tiny_s, tiny_u, small_s, small_u, medium_s,
         int_s, int_u, big_hi, big_lo FROM matrix ORDER BY event_id, row_idx"""),
    "t11c_decimal_exact" -> q(
      s"""SELECT event_id, row_idx, $GM_DEC92 AS dec92_unscaled,
         $GM_DEC1211 AS dec1211_unscaled, $GM_UBIG AS ubig_20_str,
         $GM_F32 AS f32_wide
         FROM matrix ORDER BY event_id, row_idx"""),
    "t11d_temporal_matrix" -> q(
      """SELECT event_id, row_idx, d_date, dt6_iso, time6_us, yr, dt_wire, dt_out
         FROM matrix ORDER BY event_id, row_idx"""),
    "t11e_char_binary_enum" -> q(
      s"""SELECT event_id, row_idx, ch, vch, $GM_BIN AS bin_hex, enum_v
         FROM matrix ORDER BY event_id, row_idx"""),
    "t22b_evolved_payload" -> q(
      """SELECT e.event_id, e.row_idx, e.database_name, e.table_name, v.schema_version,
           '{"id":' || CAST(e.payload_id AS STRING) || ',"k":' || CAST(e.payload_k AS STRING) ||
           CASE WHEN v.schema_version >= 2
                THEN ',' || array_to_string(list_transform(
                       generate_series(CAST(2 AS BIGINT), v.schema_version),
                       x -> '"c' || CAST(x AS STRING) || '":' || CAST(e.payload_k + x AS STRING)), ',')
                ELSE '' END || '}' AS payload_json
         FROM envelope e JOIN (SELECT event_id, schema_version FROM versions) v USING (event_id)
         ORDER BY e.event_id, e.row_idx""")
  )
}
