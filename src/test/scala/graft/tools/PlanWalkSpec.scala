package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rehearsal broadcast gate's own contract (VERDICT r12 #1a): the
  * three-arm `bounded` rule, its r13 fat-frame backstop, the exact
  * fixed-width content arithmetic, and the artifact JSON escaping. The
  * r12 round proved these gates rot silently (the r8 byte cap passed a
  * violated artifact for three rounds), so the gate itself gets specs.
  */
class PlanWalkSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("planwalk-spec", "4")

  private val RowCap = 65536L
  private val ByteCap = 32L << 20

  test("bounded: the three arms and the fat-frame backstop (unit)") {
    // bytes arm: measured small passes regardless of rows/content
    assert(PlanWalk.bounded(
      PlanWalk.Bcast(1 << 20, 1 << 20, "f", -1), RowCap, ByteCap))
    // content arm: exact fixed-width content under cap passes even when
    // allocation pages inflate bytes past the cap (the s9 ADC shape:
    // 69 MB allocated / 2.5 MB content)
    assert(PlanWalk.bounded(
      PlanWalk.Bcast(69L << 20, 51200, "f", 48), RowCap, ByteCap))
    // rows arm, fixed-width: a row-bounded frame with known content
    // passes without consulting bytes
    assert(PlanWalk.bounded(
      PlanWalk.Bcast(75L << 20, 20, "f", 24), RowCap, ByteCap))
    // rows arm, variable-width: allocation-class bytes (cap + one 64 MiB
    // page) still pass — dataSize over-reports, never under-reports
    assert(PlanWalk.bounded(
      PlanWalk.Bcast(ByteCap + PlanWalk.MaxPageBytes, 20, "f", -1),
      RowCap, ByteCap))
    // r13 backstop: sub-cap rows with UNKNOWABLE content and bytes past
    // cap + one page is the fat-string frame the r12 rows arm masked
    assert(!PlanWalk.bounded(
      PlanWalk.Bcast(ByteCap + PlanWalk.MaxPageBytes + 1, 20, "f", -1),
      RowCap, ByteCap))
    // unmeasured + unknowable content fails every arm regardless of rows
    assert(!PlanWalk.bounded(
      PlanWalk.Bcast(-1, 20, "f", -1), RowCap, ByteCap))
    // corpus-scaled rows with big bytes fail outright
    assert(!PlanWalk.bounded(
      PlanWalk.Bcast(512L << 20, 50000000, "f", -1), RowCap, ByteCap))
  }

  test("a realized sub-row-cap fat-string broadcast FAILS the gate end-to-end") {
    // 1,024 rows (far under the 65,536 row cap) of ~256 KB strings:
    // ~270 MB content, variable-width (content arm unknowable). Before
    // the r13 backstop the rows arm passed this frame no matter what it
    // measured; now its allocated bytes must exceed byteCap + one page
    // and the gate must fail.
    val fat = spark.range(1024)
      .select(col("id"), expr("repeat(uuid(), 7282)").as("blob"))
    val probe = spark.range(1024).select(col("id"))
    val joined = probe.join(broadcast(fat), "id")
    PlanWalk.execute(joined)
    val bs = PlanWalk.broadcasts(PlanWalk.walk(joined.queryExecution.executedPlan))
    assert(bs.nonEmpty, "no broadcast realized — spec vacuous")
    val b = bs.head
    assert(b.rows == 1024 && b.contentBytes == -1L,
      s"expected a sub-cap variable-width frame, got $b")
    assert(b.bytes > ByteCap + PlanWalk.MaxPageBytes,
      s"fat frame allocated only ${b.bytes} B — raise the blob size")
    assert(!PlanWalk.bounded(b, RowCap, ByteCap),
      s"fat-string frame passed the gate: $b")
  }

  test("a realized narrow broadcast still passes the gate end-to-end") {
    val dim = spark.range(100).select(col("id"), (col("id") * 7).as("v"))
    val joined = spark.range(1000).join(broadcast(dim), "id")
    PlanWalk.execute(joined)
    val bs = PlanWalk.broadcasts(PlanWalk.walk(joined.queryExecution.executedPlan))
    assert(bs.nonEmpty, "no broadcast realized — spec vacuous")
    val b = bs.head
    // all-long schema: exact content = rows × (bitset + 2 slots)
    assert(b.fixedRowBytes == 24L, s"expected 8 B bitset + 2×8 B slots, got $b")
    assert(b.contentBytes == 2400L, s"exact content wrong: $b")
    assert(PlanWalk.bounded(b, RowCap, ByteCap))
  }

  test("fixedRowBytes sizes the null bitset per 64 fields, not flat 8 B") {
    // 70 fixed-width columns need a 2-word bitset: 16 + 70×8 = 576 B/row
    val wide = spark.range(8).select(
      (0 until 70).map(i => (col("id") + i).as(s"c$i")): _*)
    val joined = spark.range(8).toDF("c0").join(broadcast(wide), "c0")
    PlanWalk.execute(joined)
    val bs = PlanWalk.broadcasts(PlanWalk.walk(joined.queryExecution.executedPlan))
    assert(bs.nonEmpty, "no broadcast realized — spec vacuous")
    assert(bs.head.fixedRowBytes == 16L + 70L * 8L,
      s"bitset not sized per 64 fields: ${bs.head}")
  }

  test("Bcast.json escapes frame strings that would corrupt the artifact") {
    val b = PlanWalk.Bcast(1, 2, """we"ird\name""", -1)
    assert(b.json ==
      """{"bytes":1,"rows":2,"content":-1,"frame":"we\"ird\\name"}""")
    // control characters become \u escapes
    assert(PlanWalk.jsonEscape("a\nb") == "a\\u000ab")
  }
}
