package graft.sqlparse

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the T21 qualified-identifier parser (SURVEY §2 T21;
  * the reference's unit corpus is tests/components/sql_handler_test.py:83-130
  * — these generalize the quoting/escaping matrix to arbitrary content).
  */
object IdentifierPropertySpec extends Properties("MysqlIdentifierParser") {

  private def backtick(n: String) = "`" + n.replace("`", "``") + "`"
  private def dquote(n: String) = "\"" + n.replace("\"", "\"\"") + "\""

  /** Arbitrary identifier content: printable unicode incl. quotes, dots,
    * spaces — anything a quoted identifier may legally contain. */
  private val namePart: Gen[String] = Gen.chooseNum(1, 12).flatMap { n =>
    Gen.stringOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('`', '"', '.', ' ', '_', '$'),
      1 -> Gen.oneOf('é', 'ü', '表', 'λ')))
  }

  private val plainPart: Gen[String] = Gen.chooseNum(1, 12).flatMap { n =>
    Gen.stringOfN(n, Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('_'),
      1 -> Gen.oneOf('é', '表')))
  }

  property("backtick-quoted round-trips any content") = Prop.forAll(namePart) { n =>
    MysqlIdentifierParser.parseUnqualified(backtick(n)) == n
  }

  property("double-quoted round-trips any content") = Prop.forAll(namePart) { n =>
    MysqlIdentifierParser.parseUnqualified(dquote(n)) == n
  }

  property("qualified db.table round-trips under mixed quoting") =
    Prop.forAll(namePart, namePart, Gen.oneOf(0, 1, 2), Gen.oneOf(0, 1, 2)) {
      (db, tbl, qdb, qtbl) =>
        def q(n: String, mode: Int) = mode match {
          case 0 => backtick(n)
          case _ => dquote(n)
        }
        MysqlIdentifierParser.parseQualified(q(db, qdb) + "." + q(tbl, qtbl)) ==
          List(db, tbl)
    }

  property("unquoted word identifiers parse as themselves") =
    Prop.forAll(plainPart) { n =>
      MysqlIdentifierParser.parseUnqualified(n) == n
    }

  property("trailing garbage after a quoted identifier is rejected") =
    Prop.forAll(namePart) { n =>
      Prop.throws(classOf[IdentifierParseError]) {
        MysqlIdentifierParser.parseUnqualified(backtick(n) + ")x")
      }
    }

  property("unterminated quote is rejected") = Prop.forAll(namePart) { n =>
    Prop.throws(classOf[IdentifierParseError]) {
      MysqlIdentifierParser.parseUnqualified("`" + n.replace("`", ""))
    }
  }
}
