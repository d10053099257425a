package graft.catalog

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Avro-resolution compatibility rules over catalog StructTypes — what the
  * reference's registry rules at registration time. Cases mirror the DDL
  * shapes of the reference's integration type matrix
  * (tests/integration/end_to_end_test.py:372-490 alter flows).
  */
class SchemaCompatSpec extends AnyFunSuite {
  import SchemaCompat._

  private def s(fs: (String, DataType, Boolean)*): StructType =
    StructType(fs.map { case (n, t, nl) => StructField(n, t, nl) })

  private val base = s(("id", LongType, false), ("name", StringType, true))

  test("identical schemas are FULL compatible") {
    assert(check(base, base).level == Full)
  }

  test("adding a nullable column is FULL (null default fills both ways)") {
    val nu = s(("id", LongType, false), ("name", StringType, true),
      ("bio", StringType, true))
    assert(check(base, nu).level == Full)
  }

  test("adding a NOT NULL column breaks backward (new reader, old data)") {
    val nu = s(("id", LongType, false), ("name", StringType, true),
      ("score", IntegerType, false))
    val r = check(base, nu)
    assert(r.level == Forward, r)
    assert(r.violations.exists(_.contains("score")), r)
  }

  test("dropping a NOT NULL column breaks forward (old reader, new data)") {
    val nu = s(("name", StringType, true))
    val r = check(base, nu)
    assert(r.level == Backward, r)
    assert(r.violations.exists(_.contains("id")), r)
  }

  test("dropping a nullable column is FULL") {
    val nu = s(("id", LongType, false))
    assert(check(base, nu).level == Full)
  }

  test("int -> long widening is backward only (old int data reads as long)") {
    val old = s(("id", IntegerType, false))
    val nu = s(("id", LongType, false))
    val r = check(old, nu)
    assert(r.level == Backward, r)
    assert(r.violations.exists(_.contains("cannot promote back")), r)
  }

  test("long -> int narrowing is forward only") {
    val old = s(("id", LongType, false))
    val nu = s(("id", IntegerType, false))
    assert(check(old, nu).level == Forward)
  }

  test("string -> int rewrite is incompatible both ways") {
    val old = s(("v", StringType, true))
    val nu = s(("v", IntegerType, true))
    val r = check(old, nu)
    assert(r.level == Incompatible, r)
    assert(r.violations.nonEmpty)
  }

  test("string <-> binary is FULL (Avro promotes both directions)") {
    val old = s(("v", StringType, true))
    val nu = s(("v", BinaryType, true))
    assert(check(old, nu).level == Full)
  }

  test("nullable -> NOT NULL on a shared field breaks backward (old nulls crash new reader)") {
    val old = s(("id", LongType, false), ("name", StringType, true))
    val nu = s(("id", LongType, false), ("name", StringType, false))
    val r = check(old, nu)
    assert(r.level == Forward, r)
    assert(r.violations.exists(_.contains("became NOT NULL")), r)
  }

  test("NOT NULL -> nullable on a shared field breaks forward (old reader can't hold new nulls)") {
    val old = s(("id", LongType, false))
    val nu = s(("id", LongType, true))
    val r = check(old, nu)
    assert(r.level == Backward, r)
    assert(r.violations.exists(_.contains("became nullable")), r)
  }

  test("primary-key change poisons both directions") {
    val a = TableSchema(1, base, containsPii = false, pkeys = Seq("id"))
    val b = TableSchema(2, base, containsPii = false, pkeys = Seq("name"))
    val r = check(a, b)
    assert(r.level == Incompatible, r)
    assert(r.violations.exists(_.contains("primary key")), r)
  }

  test("catalog records a compat report for every ALTER evolution") {
    val cat = new SchemaCatalog()
    cat.applyDdl("c", "db",
      "CREATE TABLE t (id INT NOT NULL, name VARCHAR(10), PRIMARY KEY (id))")
    cat.applyDdl("c", "db", "ALTER TABLE t ADD COLUMN bio TEXT")
    cat.applyDdl("c", "db", "ALTER TABLE t ADD COLUMN n2 INT NOT NULL")
    val log = cat.compatLog
    assert(log.size == 2, log)
    assert(log(0)._2.level == Full, log(0))
    assert(log(1)._2.level == Forward, log(1))
  }
}
