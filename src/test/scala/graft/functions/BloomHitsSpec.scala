package graft.functions

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Bloom probe must be BIT-IDENTICAL to the SQL
  * higher-order-function form it replaces (the streaming gate's oracle
  * contract runs through that SQL): same md5, same hex13 value, same
  * position, same all-k-set rule, same null semantics. */
class BloomHitsSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("bloom-hits-spec", "4")

  /** The exact SQL fragment [[graft.streaming.StreamingAnalytics
    * .bloomDecontaminationStream]] shipped before the native expression
    * (and what a non-Spark engine replays). */
  private def hofExpr(kHash: Int, mBits: Int): String = {
    val hexp = graft.data.TextOps.hex13NumFragment("h")
    s"""CAST(size(filter(shs, sh ->
          forall(transform(transform(sequence(0, ${kHash - 1}),
                   j -> md5(concat(CAST(j AS STRING), ':', sh))),
                 h -> ($hexp) % $mBits),
            p -> (shiftright(element_at(__bloom, CAST(p DIV 64 AS INT) + 1),
                  CAST(p % 64 AS INT)) & 1) = 1))) AS BIGINT)"""
  }

  test("native probe equals the SQL higher-order-function form value-for-value") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // corners: single hash + single word, the gate default, a dense
    // filter (all bits set -> every shingle counts), and a wide filter
    for (((kHash, mWords), round) <- Seq((1, 1), (3, 2), (3, 64), (4, 7)).zipWithIndex) {
      val mBits = mWords * 64
      val words =
        if (round == 2) Seq.fill(mWords)(-1L) // all set
        else Seq.fill(mWords)(rnd.nextLong())
      val docs = (0 until 200).map { i =>
        val n = rnd.nextInt(12)
        (i.toLong, Seq.fill(n)(
          s"t${rnd.nextInt(40)} u${rnd.nextInt(9)} v${rnd.nextInt(40)}"))
      }
      val both = docs.toDF("doc_id", "shs")
        .withColumn("__bloom", typedLit(words))
        .withColumn("hof", expr(hofExpr(kHash, mBits)))
        .withColumn("native", call_function("graft_bloom_hits", col("shs"),
          array(words.map(w => lit(w)): _*), lit(kHash), lit(mBits)))
      val diff = both.filter(col("hof") =!= col("native")).count()
      assert(diff == 0L, s"k=$kHash m=$mBits: $diff rows diverge")
      if (round == 2) {
        // dense filter: the count must equal size(shs) (nothing vacuous)
        assert(both.filter(col("native") =!= size(col("shs")).cast("long"))
          .count() == 0L)
      } else {
        assert(both.agg(sum("native")).collect()(0).getLong(0) >= 0L)
      }
    }
  }

  test("null semantics: null elements never count, a null array is null") {
    import spark.implicits._
    val df = Seq((1L, Seq("a b c", null, "d e f")), (2L, null))
      .toDF("doc_id", "shs")
      .withColumn("native", call_function("graft_bloom_hits", col("shs"),
        array(lit(-1L)), lit(3), lit(64))) // all bits set
    val rows = df.select("doc_id", "native").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(1L).contains(2L), "non-null shingles against a full filter")
    assert(rows(2L).isEmpty, "null shingle array must yield null")
  }

  test("analysis-time validation: non-literal bits, bad k/m, wrong word count") {
    import spark.implicits._
    val df = Seq((1L, Seq("a b c"))).toDF("doc_id", "shs")
      .withColumn("w", array(lit(0L)))
    def fails(c: org.apache.spark.sql.Column): Unit =
      intercept[Exception](df.withColumn("x", c).collect())
    fails(call_function("graft_bloom_hits", col("shs"), col("w"), lit(1), lit(64)))
    fails(call_function("graft_bloom_hits", col("shs"), array(lit(0L)), lit(0), lit(64)))
    fails(call_function("graft_bloom_hits", col("shs"), array(lit(0L)), lit(1), lit(63)))
    fails(call_function("graft_bloom_hits", col("shs"), array(lit(0L), lit(0L)), lit(1), lit(64)))
    // a null ELEMENT in the bits literal must fail AT ANALYSIS, not as
    // toLongArray()'s opaque executor-side error (ADVICE r12) — pin the
    // exception class, a runtime failure would not be an improvement
    intercept[org.apache.spark.sql.AnalysisException] {
      df.withColumn("x", call_function("graft_bloom_hits", col("shs"),
        array(lit(0L), lit(null).cast("bigint")), lit(1), lit(128))).collect()
    }
  }
}
