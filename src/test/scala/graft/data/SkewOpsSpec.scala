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

  test("gridJoin equals the plain join when both sides of a key are hot") {
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("skey", when(col("l_suppkey") % 4 === 0, lit(1L)).otherwise(col("l_suppkey")))
      .select("skey", "l_orderkey", "l_linenumber")
    val probe = Tables.lineitem(spark, sfDir)
      .withColumn("skey", when(col("l_suppkey") % 3 === 0, lit(1L)).otherwise(col("l_suppkey")))
      .filter(col("l_linenumber") === 1)
      .select(col("skey"), col("l_orderkey").as("p_orderkey"))

    val plain = probe.join(li, "skey")
      .select("skey", "l_orderkey", "l_linenumber", "p_orderkey")
    // rowsPerBlock=16 forces multi-block grids on the folded hot key
    val grid = SkewOps.gridJoin(li, probe, "skey", rowsPerBlock = 16)
      .select("skey", "l_orderkey", "l_linenumber", "p_orderkey")

    assert(grid.count() == plain.count())
    assert(grid.exceptAll(plain).isEmpty && plain.exceptAll(grid).isEmpty)
  }

  test("gridJoin fans a hot key out over a bounded-block task grid") {
    // one 100%-hot key: N fact rows, M probe rows. With cap c the join
    // key space must widen to ceil(N/c) x ceil(M/c) blocks — pair
    // generation is no longer capped at #distinct-keys tasks.
    val fact = Tables.lineitem(spark, sfDir).withColumn("k", lit(1L))
      .select("k", "l_orderkey", "l_linenumber")
    val probe = fact.filter(col("l_linenumber") === 1)
      .select(col("k"), col("l_orderkey").as("p_orderkey"))
    val cap = 64
    val nF = fact.count(); val nP = probe.count()
    val wantF = (nF + cap - 1) / cap; val wantP = (nP + cap - 1) / cap
    assert(wantF > 1 && wantP > 1, "test data must force both axes wide")

    // reproduce the helper's block assignment to count occupied cells
    val fCnt = fact.groupBy("k").agg((( count(lit(1)) + cap - 1) / cap).cast("int").as("__nf"))
    val fB = fact.join(broadcast(fCnt), "k")
      .withColumn("__bf", pmod(hash(fact.columns.toIndexedSeq.map(col): _*), col("__nf")))
    val occupied = fB.select("__bf").distinct().count()
    assert(occupied == wantF, s"hot key spread over $occupied of $wantF fact blocks")

    // and the full grid result stays row-identical to the plain join
    val plain = probe.join(fact, "k").count()
    val grid = SkewOps.gridJoin(fact, probe, "k", cap).count()
    assert(grid == plain)
  }

  test("pairBlockJoin equals the plain join and bounds realized task pairs") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("k"), col("l_orderkey").as("fe"), col("l_linenumber"))
    val probe = Tables.lineitem(spark, sfDir)
      .filter(col("l_linenumber") === 1)
      .select(col("l_suppkey").as("k"), col("l_partkey").as("pe"))
    val plain = probe.join(li, "k").select("k", "fe", "l_linenumber", "pe")
    val blocked = SkewOps.pairBlockJoin(li, probe, "k", "fe", "pe", 5, 3)
      .select("k", "fe", "l_linenumber", "pe")
    assert(blocked.count() == plain.count())
    assert(blocked.exceptAll(plain).isEmpty && plain.exceptAll(blocked).isEmpty)

    // stats: total realized pairs across tasks equals the plain join's
    // row count, and the worst task stays near total/(F*P) (hash spread)
    val stats = SkewOps.pairBlockStats(li, probe, "k", "fe", "pe", 5, 3)
      .agg(sum("task_pairs"), max("task_pairs")).collect()(0)
    assert(stats.getLong(0) == plain.count())
    assert(stats.getLong(1) <= 4L * (stats.getLong(0) / 15L + 1L),
      s"worst task ${stats.getLong(1)} vs total ${stats.getLong(0)} over 15 tasks")
  }

  test("pairGrid covers the pair volume at any size and splits replication-minimally") {
    // sub-budget → 1×1 (one task by design)
    assert(SkewOps.pairGrid(1000.0, 100, 10, 4096) == (1, 1))
    // the r9 failure point: 120.6e9 inherent pairs, 16.78M budget — the
    // clamped F=P=64 grid held only 4096 cells (29.4M pairs/task); the
    // budget must now hold without a clamp at ANY volume
    val budget = 4096L * 4096
    val (f, p) = SkewOps.pairGrid(120.6e9, 4020000L, 30000L, budget)
    assert(f.toLong * p >= math.ceil(120.6e9 / budget).toLong, "grid must cover G cells")
    assert(120.6e9 / (f.toLong * p) <= budget.toDouble, "per-task pairs must fit budget")
    // replication-minimal split: F/P tracks |fact|/|probe| (the smaller
    // side replicates more), so F ≫ P here
    assert(f > p, s"asymmetric sizing expected, got F=$f P=$p")
    // the optimum's replication is within 2× of this split's
    val g = math.ceil(120.6e9 / budget)
    val rOpt = 2 * math.sqrt(g * 4020000.0 * 30000.0)
    val r = 4020000.0 * p + 30000.0 * f
    assert(r <= 2 * rOpt, s"replication $r vs optimal $rOpt")
    // blocks never exceed rows (no empty-block waste), coverage restored
    // on the other axis
    val (f2, p2) = SkewOps.pairGrid(1e9, 100L, 1000000L, 4096L * 4096)
    assert(f2 <= 100 && f2.toLong * p2 >= math.ceil(1e9 / budget).toLong)
  }

  test("q32 body with forced tiny blocks equals the default-cap body") {
    import graft.data.{RelationalQueries => RQ}
    val tiny = RQ.activitySimilarity(spark, sfDir, rowsPerBlock = 2).collect()
    val dflt = RQ.activitySimilarity(spark, sfDir, RQ.SkewBlockRows).collect()
    assert(tiny.toSeq == dflt.toSeq)
    assert(dflt.nonEmpty)
  }

  test("q32b selector: pruned and dense plans are row-identical; phased data engages pruning") {
    import graft.data.{RelationalQueries => RQ}
    // phased synthetic profiles — 16 disjoint 4-bucket activity windows,
    // the time-phased regime prefix filtering exists for (the real
    // corpus is near-uniform, where the dense plan wins — asserted below)
    val sparse = spark.range(2000).select(col("id").as("user_id"))
      .withColumn("g", pmod(hash(col("user_id")), lit(16)))
      .withColumn("bucket", explode(expr("sequence(g * 4L, g * 4L + 3L)")))
      .withColumn("n", (pmod(hash(col("user_id"), col("bucket")), lit(20)) + 1).cast("long"))
      .select("user_id", "bucket", "n")
    val dense = RQ.denseFromSparse(sparse)
    val (idxInc, allPairs) = RQ.rangeSelector(sparse, dense)
    assert(idxInc < allPairs,
      s"phased data must engage the pruned plan: idxInc=$idxInc allPairs=$allPairs")
    val pruned = RQ.rangePruned(sparse, dense).collect().toSeq
    val densePlan = RQ.rangeDense(sparse, dense).collect().toSeq
    assert(pruned == densePlan, "the two exact plans must be row-identical")
    assert(pruned.nonEmpty, "same-phase users are similar — threshold must select pairs")
    // sanity: the pruned plan really pruned — candidates are a strict
    // subset of all pairs (disjoint phases share no bucket at all)
    assert(pruned.size < allPairs)

    // the real corpus: near-uniform profiles, selector must pick dense
    val (rs, _) = RQ.activityProfiles(spark, sfDir)
    val rd = RQ.denseFromSparse(rs)
    val (ri, ra) = RQ.rangeSelector(rs, rd)
    assert(ri >= ra,
      s"near-uniform corpus must select the dense plan: idxInc=$ri allPairs=$ra")
  }

  test("the salt column spreads a hot key over many sub-keys") {
    val li = Tables.lineitem(spark, sfDir).withColumn("skey", lit(1L)) // 100% skew
    val salted = li.withColumn("__salt", pmod(hash(li.columns.map(col) :+ col("skey"): _*), lit(16)))
    val n = salted.select("__salt").distinct().count()
    assert(n >= 12, s"hot key only spread over $n sub-keys")
  }
}
