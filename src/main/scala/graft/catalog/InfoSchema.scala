package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Table metadata derived from information_schema snapshots — the
  * reference's alternative (connection-based) schema derivation
  * (`components/mysql_parser.py:38-190`): `MySQLTable` /
  * `MySQLColumn` / `MySQLKey` namedtuples built from
  * `information_schema.COLUMNS` ordered by ORDINAL_POSITION and
  * `KEY_COLUMN_USAGE` filtered to `CONSTRAINT_NAME='PRIMARY'`.
  *
  * Here the snapshots arrive as DataFrames (a JDBC read of the two
  * information_schema tables produces exactly these shapes); they are
  * control-plane tiny (one row per column of tracked tables), so the
  * collect-and-order step is driver-side by design, like the reference's
  * cursor fetch. The derived [[MysqlTable]] lowers to the same
  * `StructType` + pkeys the DDL-text path produces — proved by the
  * cross-derivation spec — so either source can feed [[SchemaCatalog]]
  * with identical schema fingerprints.
  */
object InfoSchema {

  /** Subset of information_schema.COLUMNS the derivation needs
    * (reference mysql_parser.py:26-31; COLUMN_TYPE carries the full
    * parameterized type text, e.g. `decimal(10,2) unsigned`). */
  final case class MysqlColumn(
      columnName: String,
      ordinalPosition: Int,
      isNullable: Boolean,
      columnType: String)

  /** KEY_COLUMN_USAGE row (reference mysql_parser.py:32-35). */
  final case class MysqlKey(
      constraintName: String,
      columnName: String,
      ordinalPosition: Int)

  /** Reference mysql_parser.py:22-25. */
  final case class MysqlTable(
      dbName: String,
      tableName: String,
      columns: Seq[MysqlColumn],
      primaryKeys: Seq[MysqlKey])

  /** Derive one table's metadata from the two snapshot frames.
    * `columns` needs (TABLE_SCHEMA, TABLE_NAME, COLUMN_NAME,
    * ORDINAL_POSITION, IS_NULLABLE, COLUMN_TYPE); `keys` needs those id
    * columns plus CONSTRAINT_NAME. Both are filtered here, mirroring the
    * two WHERE clauses of mysql_parser.py:140-181. */
  def deriveTable(columns: DataFrame, keys: DataFrame,
      dbName: String, tableName: String): MysqlTable = {
    val cols = columns
      .filter(col("TABLE_SCHEMA") === dbName && col("TABLE_NAME") === tableName)
      .orderBy("ORDINAL_POSITION")
      .select("COLUMN_NAME", "ORDINAL_POSITION", "IS_NULLABLE", "COLUMN_TYPE")
      .collect()
      .map(r => MysqlColumn(r.getString(0), r.getInt(1),
        r.getString(2).equalsIgnoreCase("YES"), r.getString(3)))
    val pks = keys
      .filter(col("TABLE_SCHEMA") === dbName && col("TABLE_NAME") === tableName &&
        col("CONSTRAINT_NAME") === "PRIMARY")
      .orderBy("ORDINAL_POSITION")
      .select("CONSTRAINT_NAME", "COLUMN_NAME", "ORDINAL_POSITION")
      .collect()
      .map(r => MysqlKey(r.getString(0), r.getString(1), r.getInt(2)))
    MysqlTable(dbName, tableName, cols.toSeq, pks.toSeq)
  }

  /** Lower to the engine StructType with the same type mapping the DDL
    * path uses, so both derivations fingerprint identically. Nullability
    * follows IS_NULLABLE, with primary-key members forced NOT NULL (the
    * server reports 'NO' for them; forcing makes a stale snapshot frame
    * still fingerprint-match the DDL path). */
  def structOf(t: MysqlTable): StructType = {
    val pk = pkeyNames(t).toSet
    StructType(t.columns.sortBy(_.ordinalPosition).map(c =>
      org.apache.spark.sql.types.StructField(
        c.columnName, MysqlDdlToStruct.mysqlType(c.columnType),
        nullable = c.isNullable && !pk(c.columnName))))
  }

  def pkeyNames(t: MysqlTable): Seq[String] =
    t.primaryKeys.sortBy(_.ordinalPosition).map(_.columnName)

  /** Register every table present in the snapshot frames — the bulk
    * bootstrap path (the reference walks all tracked tables on startup).
    * Each snapshot frame is collected ONCE and grouped driver-side — a
    * per-table filter+collect would launch 2 Spark jobs per tracked table
    * at startup for no benefit. */
  def registerAll(catalog: SchemaCatalog, cluster: String,
      columns: DataFrame, keys: DataFrame): Seq[TableSchema] = {
    val cols = columns
      .select("TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME",
        "ORDINAL_POSITION", "IS_NULLABLE", "COLUMN_TYPE")
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    val pks = keys
      .filter(col("CONSTRAINT_NAME") === "PRIMARY")
      .select("TABLE_SCHEMA", "TABLE_NAME", "CONSTRAINT_NAME", "COLUMN_NAME",
        "ORDINAL_POSITION")
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    cols.keys.toSeq.sorted.map { case (db, tbl) =>
      val t = MysqlTable(db, tbl,
        cols((db, tbl)).sortBy(_.getInt(3)).map(r => MysqlColumn(
          r.getString(2), r.getInt(3), r.getString(4).equalsIgnoreCase("YES"),
          r.getString(5))).toSeq,
        pks.getOrElse((db, tbl), Array.empty).sortBy(_.getInt(4)).map(r =>
          MysqlKey(r.getString(2), r.getString(3), r.getInt(4))).toSeq)
      catalog.register(TableId(cluster, db, tbl), structOf(t), pkeyNames(t))
    }
  }
}
