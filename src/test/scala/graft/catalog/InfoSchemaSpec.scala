package graft.catalog

import graft.Tables
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** information_schema-based derivation (reference mysql_parser.py:38-190)
  * and its equivalence with the DDL-text path. */
class InfoSchemaSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("infoschema-spec", "4")
  import spark.implicits._

  private def columnsFrame = Seq(
    // (TABLE_SCHEMA, TABLE_NAME, COLUMN_NAME, ORDINAL_POSITION, IS_NULLABLE, COLUMN_TYPE)
    ("db", "biz", "id", 1, "NO", "int(11)"),
    ("db", "biz", "name", 2, "YES", "varchar(64)"),
    ("db", "biz", "score", 3, "YES", "decimal(10,2)"),
    ("db", "biz", "opened", 4, "YES", "datetime(6)"),
    ("db", "biz", "tags", 5, "YES", "set('a','b')"),
    ("db", "other", "k", 1, "NO", "bigint(20) unsigned")
  ).toDF("TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME",
    "ORDINAL_POSITION", "IS_NULLABLE", "COLUMN_TYPE")

  private def keysFrame = Seq(
    ("db", "biz", "PRIMARY", "name", 2),
    ("db", "biz", "PRIMARY", "id", 1),
    ("db", "biz", "uq_name", "name", 1), // non-PRIMARY constraint filtered out
    ("db", "other", "PRIMARY", "k", 1)
  ).toDF("TABLE_SCHEMA", "TABLE_NAME", "CONSTRAINT_NAME", "COLUMN_NAME", "ORDINAL_POSITION")

  test("columns arrive ordinal-ordered; keys only from CONSTRAINT_NAME='PRIMARY'") {
    val t = InfoSchema.deriveTable(columnsFrame, keysFrame, "db", "biz")
    assert(t.columns.map(_.columnName) == Seq("id", "name", "score", "opened", "tags"))
    assert(!t.columns.head.isNullable && t.columns(1).isNullable)
    // key order is the key's ordinal, not declaration order in the frame
    assert(InfoSchema.pkeyNames(t) == Seq("id", "name"))
    assert(t.primaryKeys.forall(_.constraintName == "PRIMARY"))
  }

  test("lowered StructType uses the engine type mapping") {
    val t = InfoSchema.deriveTable(columnsFrame, keysFrame, "db", "biz")
    val s = InfoSchema.structOf(t)
    assert(s.fields.map(_.dataType).toSeq == Seq(IntegerType, StringType,
      DecimalType(10, 2), StringType /* datetime → ISO-8601 */, ArrayType(StringType)))
    val o = InfoSchema.deriveTable(columnsFrame, keysFrame, "db", "other")
    assert(InfoSchema.structOf(o).head.dataType == DecimalType(20, 0))
  }

  test("info-schema and DDL-text derivations fingerprint identically in the catalog") {
    val c1 = new SchemaCatalog()
    val viaDdl = c1.applyDdl("cl", "db",
      """CREATE TABLE biz (id int(11) NOT NULL, name varchar(64), score decimal(10,2),
         opened datetime(6), tags set('a','b'), PRIMARY KEY (id, name))""").get
    val t = InfoSchema.deriveTable(columnsFrame, keysFrame, "db", "biz")
    val viaInfo = c1.register(TableId("cl", "db", "biz"),
      InfoSchema.structOf(t), InfoSchema.pkeyNames(t))
    // same columns + same key ⇒ same fingerprint ⇒ same schema_id
    assert(viaInfo.schemaId == viaDdl.schemaId)
    assert(viaInfo.struct == viaDdl.struct && viaInfo.pkeys == viaDdl.pkeys)
  }

  test("registerAll bootstraps every table in the snapshot deterministically") {
    val c = new SchemaCatalog()
    val all = InfoSchema.registerAll(c, "cl", columnsFrame, keysFrame)
    assert(all.size == 2)
    assert(c.all.keySet == Set(TableId("cl", "db", "biz"), TableId("cl", "db", "other")))
    assert(c.all(TableId("cl", "db", "other")).pkeys == Seq("k"))
  }
}
