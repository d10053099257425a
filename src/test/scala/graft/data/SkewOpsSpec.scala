package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewOpsSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("skew-ops-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

  test("salted join equals the plain join on a skewed key") {
    // synthesize skew: fold most suppkeys onto one hot key
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("skey", when(col("l_suppkey") % 4 === 0, lit(1L)).otherwise(col("l_suppkey")))
    val supp = Tables.supplier(spark, sfDir)
      .withColumn("skey", col("s_suppkey"))
      .select("skey", "s_name")

    val plain = li.join(supp, "skey").select("skey", "l_orderkey", "l_linenumber", "s_name")
    val salted = SkewOps.saltedJoin(li, supp, "skey")
      .select("skey", "l_orderkey", "l_linenumber", "s_name")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the salt column spreads a hot key over many sub-keys") {
    val li = Tables.lineitem(spark, sfDir).withColumn("skey", lit(1L)) // 100% skew
    val salted = li.withColumn("__salt", pmod(hash(li.columns.map(col) :+ col("skey"): _*), lit(16)))
    val n = salted.select("__salt").distinct().count()
    assert(n >= 12, s"hot key only spread over $n sub-keys")
  }
}
