package graft.cdc

import graft.sqlparse.MysqlStatementClassifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Control-plane and positioning operators (SURVEY §2 T17, T20-T23,
  * T26-T33, T37) as oracle-checked batch queries.
  *
  * Scale notes: the unpartitioned windows (cache_epoch, global position
  * numbering) model driver-side state — in the streaming engine the global
  * order exists only at the single saved position, not as a data-plane
  * shuffle. Per-topic/per-table windows and aggregations are the scalable
  * data-plane shapes. The one-row cutoff frames join via broadcast.
  */
object CdcControlQueries {
  import CdcSqlFragments._

  private def c(fn: CdcChain => DataFrame): (SparkSession, String) => DataFrame =
    (spark, sfDir) => fn(new CdcChain(spark, sfDir))

  // ---- DDL text + classification (T20/T21) ---------------------------

  private val classifyKindUdf = udf((s: String) => MysqlStatementClassifier.classify(s).kind)
  private val isSupportedUdf = udf((s: String) => MysqlStatementClassifier.classify(s).isSupported)
  private val doesRenameUdf = udf((s: String) => MysqlStatementClassifier.classify(s).doesRenameTable)
  private val parsedDbUdf = udf((s: String) => MysqlStatementClassifier.classify(s).databaseName.orNull)
  private val parsedTableUdf = udf((s: String) => MysqlStatementClassifier.classify(s).table.orNull)
  private val isSkippableUdf = udf((s: String) => MysqlStatementClassifier.isSkippable(s))

  private def ddls(ch: CdcChain): DataFrame =
    CdcOps.ddlOnly(ch.admitted).withColumn("stmt", expr(CdcSqlFragments.DDL_STMT))

  // ---- windows over the admitted stream (T17/T22-T24) ----------------

  /** Running DDL counters without windowing the big stream: a global (or
    * per-table) running sum over ALL events would single-partition (or
    * skew-partition: #tables partitions) the data. DDLs are control-plane
    * tiny, so instead number THEM (tiny frame) and as-of join every event
    * to the last DDL at or before it — [[graft.data.AsOfJoin]]'s bucketed
    * linear shape, keyed on event_id. */
  /** DDLs are ~4% of events (so one per ~25 ids): bucket width 64 keeps
    * O(1) right rows per bucket — a too-wide bucket multiplies the
    * in-bucket join by the per-bucket DDL count. */
  private val ID_BUCKET = 64L

  private def epochs(ch: CdcChain): DataFrame = {
    val renames = ch.admitted.filter(expr(IS_RENAME_DDL))
      .select(col("event_id").as("ddl_id"))
      .withColumn("idx", row_number().over(Window.orderBy("ddl_id")).cast("long"))
    graft.data.AsOfJoin.lastBefore(
      ch.admitted, "event_id", "event_id", renames, "ddl_id", "idx", ID_BUCKET)
      .withColumn("cache_epoch", coalesce(col("asof_val"), lit(0L)))
      .drop("asof_ts", "asof_val")
  }

  private def versions(ch: CdcChain): DataFrame = {
    val alters = ch.admitted.filter(expr(IS_ALTER_DDL))
      .select(col("database_name"), col("base_table"), col("event_id").as("ddl_id"))
      .withColumn("idx", row_number().over(
        Window.partitionBy("database_name", "base_table").orderBy("ddl_id")).cast("long"))
    graft.data.AsOfJoin.lastBefore(
      ch.admitted, "event_id", "event_id", alters, "ddl_id", "idx", ID_BUCKET,
      keys = Seq("database_name", "base_table"))
      .withColumn("schema_version", lit(1L) + coalesce(col("asof_val"), lit(0L)))
      .drop("asof_ts", "asof_val")
  }

  // ---- position numbering / recovery (T27-T33) -----------------------

  private val wFull =
    Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
  private val wTopic = Window.partitionBy("topic").orderBy("pos_key")

  /** Global sequence numbers without a global single-partition sort.
    *
    * `row_number() OVER (ORDER BY pos_key)` moves EVERYTHING to one
    * partition (Spark even warns "No Partition Defined for Window
    * operation"), which is fatal at 100 TB. Two-phase instead:
    * range-repartition by pos_key (ranges are assigned to ascending
    * partition ids), number rows within each partition in parallel, then
    * add per-partition offsets computed on a #partitions-row frame and
    * broadcast back. `rn` is identical to the global row_number because
    * pos_key is unique and ranges are ordered.
    */
  /** Two-phase global numbering by a unique `orderCol`: range-repartition
    * (ranges land on ascending partition ids), number locally in parallel,
    * then add per-partition offsets computed on a #partitions-row frame
    * and broadcast back. Identical to a global row_number because the
    * order column is unique and ranges are ordered — without moving the
    * data to one partition. The offsets window is unpartitioned but runs
    * over #partitions rows by construction. */
  private def twoPhaseNumber(df: DataFrame, orderCol: String,
      rnName: String, cntName: String): DataFrame = {
    // persist: `local` feeds both the offsets aggregate and the join; an
    // unmaterialized range shuffle can be recomputed with DIFFERENT
    // sampled range bounds per branch, which desynchronizes partition ids
    // and corrupts the numbering (observed at sf0.1)
    val local = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn",
        row_number().over(Window.partitionBy("__pid").orderBy(orderCol)).cast("long"))
      .persist()
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__pn"))
      .withColumn("__off", coalesce(
        sum("__pn").over(Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn(cntName, sum("__pn").over(wFull).cast("long"))
      .select("__pid", "__off", cntName)
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnName, col("__lrn") + col("__off"))
      .drop("__pid", "__lrn", "__off")
  }

  private def numbered(ch: CdcChain): DataFrame =
    twoPhaseNumber(ch.env, "pos_key", "rn", "cnt")
      .withColumn("seq", row_number().over(wTopic).cast("long"))

  private def cutoff(n: DataFrame): DataFrame =
    n.filter(col("rn") === floor(col("cnt") * 0.6).cast("long"))
      .select(col("pos_key").as("saved_pos"), col("rn").as("saved_rn"),
        col("log_file").as("saved_file"))

  private def kafkaCutoff(n: DataFrame): DataFrame =
    n.filter(col("rn") === floor(col("cnt") * 0.65).cast("long"))
      .select(col("pos_key").as("kafka_pos"))

  private def candidates(n: DataFrame): DataFrame =
    n.crossJoin(broadcast(cutoff(n)))
      .filter(col("rn") > col("saved_rn") && col("rn") <= col("saved_rn") + 1500)

  // ---- GTID auto-position (reference util/position.py:74-107) --------

  /** The [[GtidPosition]] arithmetic, lifted into the plan: both run on the
    * ONE saved-position row, so the UDF is control-plane-only. */
  private val autoPositionUdf = udf((gtid: String, offset: Int) =>
    GtidPosition(Some(gtid), Some(offset)).toReplicationDict("auto_position"))
  private val resumeTxnUdf = udf((gtid: String, offset: Int) =>
    GtidPosition.resumeTxn(gtid, Some(offset)))

  /** Heartbeat history grows with wall time, not data volume — but years
    * of beacons still should not single-partition, so it gets the same
    * two-phase numbering as the envelope. */
  private def hbs(ch: CdcChain): DataFrame =
    twoPhaseNumber(
      ch.cdc.filter(col("kind") === "heartbeat")
        .select(col("event_id").as("serial"), col("ts_us"), col("log_file"), col("log_pos")),
      "serial", "hb_rn", "hb_cnt")

  // ---- queries -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t17_cache_epochs" -> c { ch =>
      epochs(ch).filter(col("kind") === "data")
        .select("event_id", "cache_epoch").orderBy("event_id")
    },
    "t20_ddl_classify" -> c { ch =>
      ddls(ch).select(col("event_id"), col("stmt"),
        classifyKindUdf(col("stmt")).as("stmt_kind"),
        isSupportedUdf(col("stmt")).as("is_supported"),
        doesRenameUdf(col("stmt")).as("does_rename"),
        isSkippableUdf(col("stmt")).as("is_skippable"))
        .orderBy("event_id")
    },
    "t21_identifier_parse" -> c { ch =>
      ddls(ch).filter(expr("k % 8 IN (0, 1, 2, 4)"))
        .select(col("event_id"),
          parsedDbUdf(col("stmt")).as("parsed_db"),
          parsedTableUdf(col("stmt")).as("parsed_table"))
        .orderBy("event_id")
    },
    "t23_schema_versions" -> c { ch =>
      versions(ch).filter(col("kind") === "data")
        .select("event_id", "database_name", "base_table", "schema_version")
        .orderBy("event_id")
    },
    "t26_topic_assign" -> c { ch =>
      ch.env.groupBy("topic").agg(count(lit(1)).as("n_messages")).orderBy("topic")
    },
    "t27_checkpoint_state" -> c { ch =>
      ch.env.groupBy("topic")
        .agg(count(lit(1)).as("kafka_offset"), max("pos_key").as("max_pos_key"))
        .orderBy("topic")
    },
    "t28_position_resume" -> c { ch =>
      val n = numbered(ch)
      n.crossJoin(broadcast(cutoff(n)))
        .filter(col("pos_key") > col("saved_pos"))
        .select("event_id", "row_idx", "pos_key").orderBy("pos_key")
    },
    "t28b_gtid_resume" -> c { ch =>
      // GTID-mode resume (reference position.py:74-107 + position_finder):
      // the saved position is the 60%-cutoff row's gtid plus an
      // in-transaction offset (rn % 3 — exercising both the offset and the
      // no-offset arithmetic branch depending on the data). The replayed
      // set is txn > resume OR (txn = resume AND skip `offset` row images)
      // — a single filter that covers both branches because offset 0 maps
      // to resume = txn+1.
      val n = numbered(ch).withColumn("txn", expr(GTID_TXN)).persist()
      val saved = n.filter(col("rn") === floor(col("cnt") * 0.6).cast("long"))
        .select(
          concat(lit(GTID_SID + ":"), col("txn").cast("string")).as("saved_gtid"),
          (col("rn") % 3).cast("int").as("saved_offset"))
        .withColumn("auto_position", autoPositionUdf(col("saved_gtid"), col("saved_offset")))
        .withColumn("resume_txn", resumeTxnUdf(col("saved_gtid"), col("saved_offset")))
      // txn is high-cardinality (events/4), so the window never collapses
      n.withColumn("txn_row",
          (row_number().over(Window.partitionBy("txn").orderBy("pos_key")) - 1).cast("long"))
        .crossJoin(broadcast(saved))
        .filter(col("txn") > col("resume_txn") ||
          (col("txn") === col("resume_txn") && col("txn_row") >= col("saved_offset")))
        .select("event_id", "row_idx", "pos_key", "auto_position")
        .orderBy("pos_key")
    },
    "t29_offset_seek" -> c { ch =>
      val n = numbered(ch)
      n.crossJoin(broadcast(cutoff(n)))
        .filter(col("log_file") === col("saved_file") && col("rn") > col("saved_rn") + 3)
        .select("event_id", "row_idx", "pos_key").orderBy("pos_key")
    },
    "t31_replay_dedupe" -> c { ch =>
      // the numbered frame feeds four subtrees (cutoffs, candidates, saved
      // offsets); persist so the envelope + range shuffle run once
      val n = numbered(ch).persist()
      val saved = n.crossJoin(broadcast(kafkaCutoff(n)))
        .filter(col("pos_key") <= col("kafka_pos"))
        .groupBy("topic").agg(count(lit(1)).as("saved_n"))
      candidates(n).join(broadcast(saved), Seq("topic"), "left")
        .filter(col("seq") > coalesce(col("saved_n"), lit(0L)))
        .select("event_id", "row_idx", "topic", "seq")
        .orderBy("topic", "seq")
    },
    "t32_catchup_bound" -> c { ch =>
      candidates(numbered(ch))
        .agg(count(lit(1)).as("n_replayed"),
          (max(col("rn")) === max(col("cnt"))).as("caught_up"))
    },
    "t33_heartbeat_search" -> c { ch =>
      val h = hbs(ch)
      val target = h.filter(col("hb_rn") === floor(col("hb_cnt") / 2.0).cast("long"))
        .select(col("serial").as("target_serial"))
      val files = h.groupBy("log_file").agg(min("serial").as("first_serial"))
      val scanned = files.crossJoin(broadcast(target))
        .filter(col("first_serial") > col("target_serial"))
        .agg(count(lit(1)).as("n_scanned"))
      h.crossJoin(broadcast(target)).filter(col("serial") === col("target_serial"))
        .crossJoin(broadcast(scanned))
        .select(col("log_file"), col("log_pos"), col("serial"),
          (col("n_scanned") + 1).as("n_files_scanned"))
    },
    "t37_stats_counters" -> c { ch =>
      ch.env
        .withColumn("bucket_start_us", col("ts_us") - col("ts_us") % 600000000L)
        .groupBy("table_name", "bucket_start_us")
        .agg(count(lit(1)).as("n"))
        .orderBy("table_name", "bucket_start_us")
    }
  )

  import CdcOracle.q

  val oracle: Map[String, String] = Map(
    "t17_cache_epochs" -> q(
      "SELECT event_id, cache_epoch FROM epochs WHERE kind = 'data' ORDER BY event_id"),
    "t20_ddl_classify" -> q("""
      SELECT event_id, stmt,
        CASE k % 8 WHEN 0 THEN 'create_table' WHEN 1 THEN 'alter_table'
          WHEN 2 THEN 'alter_table' WHEN 3 THEN 'rename_table'
          WHEN 4 THEN 'drop_table' WHEN 5 THEN 'create_database'
          ELSE 'unsupported' END AS stmt_kind,
        k % 8 <= 5 AS is_supported,
        k % 8 = 2 AS does_rename,
        k % 8 = 6 AS is_skippable
      FROM ddls ORDER BY event_id"""),
    "t21_identifier_parse" -> q("""
      SELECT event_id,
        CASE WHEN k % 8 = 0 THEN database_name ELSE NULL END AS parsed_db,
        base_table AS parsed_table
      FROM ddls WHERE k % 8 IN (0, 1, 2, 4) ORDER BY event_id"""),
    "t23_schema_versions" -> q(
      "SELECT event_id, database_name, base_table, schema_version FROM versions WHERE kind = 'data' ORDER BY event_id"),
    "t26_topic_assign" -> q(
      "SELECT topic, CAST(count(*) AS BIGINT) AS n_messages FROM envelope GROUP BY topic ORDER BY topic"),
    "t27_checkpoint_state" -> q("""
      SELECT topic, CAST(count(*) AS BIGINT) AS kafka_offset, max(pos_key) AS max_pos_key
      FROM envelope GROUP BY topic ORDER BY topic"""),
    "t28_position_resume" -> q("""
      SELECT event_id, row_idx, pos_key FROM numbered, cutoff
      WHERE pos_key > saved_pos ORDER BY pos_key"""),
    "t28b_gtid_resume" -> q(s"""
      , gnumbered AS (
        SELECT *, $GTID_TXN AS txn FROM numbered
      ), gsaved AS (
        SELECT CAST(rn % 3 AS INT) AS saved_offset,
          CASE WHEN rn % 3 <> 0 THEN txn ELSE txn + 1 END AS resume_txn,
          '$GTID_SID' || ':1-' ||
            CAST(CASE WHEN rn % 3 <> 0 THEN txn ELSE txn + 1 END AS STRING) AS auto_position
        FROM gnumbered WHERE rn = CAST(floor(cnt * 0.6) AS BIGINT)
      ), gtxn AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY txn ORDER BY pos_key) AS BIGINT) - 1 AS txn_row
        FROM gnumbered
      )
      SELECT g.event_id, g.row_idx, g.pos_key, s.auto_position
      FROM gtxn g, gsaved s
      WHERE g.txn > s.resume_txn OR (g.txn = s.resume_txn AND g.txn_row >= s.saved_offset)
      ORDER BY g.pos_key"""),
    "t29_offset_seek" -> q("""
      SELECT event_id, row_idx, pos_key FROM numbered n, cutoff c
      WHERE n.log_file = c.saved_file AND n.rn > c.saved_rn + 3 ORDER BY pos_key"""),
    "t31_replay_dedupe" -> q("""
      SELECT c.event_id, c.row_idx, c.topic, c.seq
      FROM candidates c LEFT JOIN saved_offsets s ON c.topic = s.topic
      WHERE c.seq > coalesce(s.saved_n, 0)
      ORDER BY c.topic, c.seq"""),
    "t32_catchup_bound" -> q("""
      SELECT CAST(count(*) AS BIGINT) AS n_replayed, max(rn) = max(cnt) AS caught_up
      FROM candidates"""),
    "t33_heartbeat_search" -> q("""
      SELECT h.log_file, h.log_pos, h.serial,
        (SELECT CAST(count(*) AS BIGINT) FROM hb_files f, hb_target t2
         WHERE f.first_serial > t2.target_serial) + 1 AS n_files_scanned
      FROM hbs h, hb_target t WHERE h.serial = t.target_serial"""),
    "t37_stats_counters" -> q("""
      SELECT table_name, ts_us - ts_us % 600000000 AS bucket_start_us,
        CAST(count(*) AS BIGINT) AS n
      FROM envelope GROUP BY 1, 2 ORDER BY 1, 2""")
  )
}
