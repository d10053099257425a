package graft.catalog

import org.apache.spark.sql.types._

/** Registration-time schema-compatibility checking.
  *
  * The reference registers every schema change with its external registry
  * (Schematizer) at DDL time (reference components/schema_event_handler.py:
  * 154-175, schema_wrapper.py:97-141); the registry's job is to refuse
  * changes that would break existing readers. This module re-expresses
  * those rules over the catalog's `StructType`s using the standard Avro
  * schema-resolution semantics (the wire format the reference emits):
  *
  *  - BACKWARD: a reader of the NEW schema can read data written with the
  *    OLD one — every field the new schema adds must be fillable (nullable
  *    here, i.e. has an Avro null default), and shared fields may only
  *    change type along Avro's promotion lattice (int→long→float→double,
  *    string↔bytes).
  *  - FORWARD: a reader of the OLD schema can read NEW data — fields the
  *    new schema dropped must have been fillable in the old one, and
  *    shared-field types may only promote in the opposite direction.
  *  - FULL: both; NONE: neither.
  *
  * A CDC consumer doing upserts also breaks if the primary key changes, so
  * a pkey change is a violation for both directions (the reference models
  * pkeys in its Avro output for the same reason — mysql_parser.py:22-35).
  */
object SchemaCompat {

  sealed abstract class Level(val name: String)
  case object Full extends Level("FULL")
  case object Backward extends Level("BACKWARD")
  case object Forward extends Level("FORWARD")
  case object Incompatible extends Level("NONE")

  /** Avro type promotion: data written as `from` is readable as `to`. */
  def promotable(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IntegerType | ShortType | ByteType, LongType | FloatType | DoubleType) => true
    case (LongType, FloatType | DoubleType) => true
    case (FloatType, DoubleType) => true
    case (StringType, BinaryType) | (BinaryType, StringType) => true
    case _ => false
  }

  /** Violations that break a NEW-schema reader on OLD data (backward).
    * A shared field that becomes NOT NULL is a break: the new reader's
    * required (non-union) field crashes on old records carrying null —
    * dropping the null branch of a union is not a permitted Avro
    * resolution. */
  def backwardViolations(old: StructType, nu: StructType): Seq[String] = {
    val oldByName = old.fields.map(f => f.name -> f).toMap
    nu.fields.toSeq.flatMap { f =>
      oldByName.get(f.name) match {
        case None if !f.nullable =>
          Some(s"added field '${f.name}' has no default (NOT NULL)")
        case Some(o) if !promotable(o.dataType, f.dataType) =>
          Some(s"field '${f.name}': ${o.dataType.simpleString} cannot promote to ${f.dataType.simpleString}")
        case Some(o) if o.nullable && !f.nullable =>
          Some(s"field '${f.name}' became NOT NULL; old data may hold nulls")
        case _ => None
      }
    }
  }

  /** Violations that break an OLD-schema reader on NEW data (forward).
    * Symmetrically, a shared field that becomes nullable breaks the old
    * reader, whose required field cannot hold the new data's nulls. */
  def forwardViolations(old: StructType, nu: StructType): Seq[String] = {
    val nuByName = nu.fields.map(f => f.name -> f).toMap
    old.fields.toSeq.flatMap { f =>
      nuByName.get(f.name) match {
        case None if !f.nullable =>
          Some(s"removed field '${f.name}' had no default (NOT NULL)")
        case Some(n) if !promotable(n.dataType, f.dataType) =>
          Some(s"field '${f.name}': ${n.dataType.simpleString} cannot promote back to ${f.dataType.simpleString}")
        case Some(n) if n.nullable && !f.nullable =>
          Some(s"field '${f.name}' became nullable; the old reader's required field cannot hold new nulls")
        case _ => None
      }
    }
  }

  final case class Report(level: Level, violations: Seq[String])

  def check(old: TableSchema, nu: TableSchema): Report = {
    val pkeyViolation =
      if (old.pkeys != nu.pkeys)
        Seq(s"primary key changed: ${old.pkeys.mkString(",")} -> ${nu.pkeys.mkString(",")}")
      else Nil
    val bw = pkeyViolation ++ backwardViolations(old.struct, nu.struct)
    val fw = pkeyViolation ++ forwardViolations(old.struct, nu.struct)
    (bw.isEmpty, fw.isEmpty) match {
      case (true, true) => Report(Full, Nil)
      case (true, false) => Report(Backward, fw)
      case (false, true) => Report(Forward, bw)
      case (false, false) => Report(Incompatible, (bw ++ fw).distinct)
    }
  }

  def check(old: StructType, nu: StructType): Report =
    check(TableSchema(0, old, containsPii = false),
      TableSchema(0, nu, containsPii = false))
}
