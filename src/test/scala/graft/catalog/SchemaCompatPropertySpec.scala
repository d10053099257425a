package graft.catalog

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

/** Properties of the Avro-resolution compatibility rules over arbitrary
  * schema pairs.
  */
object SchemaCompatPropertySpec extends Properties("SchemaCompat") {
  import SchemaCompat._

  private val types: Gen[DataType] = Gen.oneOf(IntegerType, LongType,
    FloatType, DoubleType, StringType, BinaryType, BooleanType)

  private val field: Gen[StructField] = for {
    n <- Gen.oneOf("a", "b", "c", "d")
    t <- types
    nl <- Gen.oneOf(true, false)
  } yield StructField(n, t, nl)

  private val schema: Gen[StructType] = Gen.chooseNum(0, 4)
    .flatMap(n => Gen.listOfN(n, field))
    .map(fs => StructType(fs.distinctBy(_.name)))

  property("reflexivity: every schema is FULL-compatible with itself") =
    Prop.forAll(schema) { x =>
      backwardViolations(x, x).isEmpty && forwardViolations(x, x).isEmpty
    }

  /** backward(a→b) asks "can a b-reader read a-data"; forward(b→a) asks
    * the same question with the role names swapped — the verdicts must
    * agree on every schema pair. */
  property("duality: backward(a,b) holds iff forward(b,a) holds") =
    Prop.forAll(schema, schema) { (x, y) =>
      backwardViolations(x, y).isEmpty == forwardViolations(y, x).isEmpty
    }

  property("a pure field ADDITION with nullable fields is always FULL") =
    Prop.forAll(schema, field) { (x, f0) =>
      val f = f0.copy(name = "zz", nullable = true)
      val nu = StructType(x.fields :+ f)
      SchemaCompat.check(x, nu).level == Full
    }
}
