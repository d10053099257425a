package graft.data

import graft.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Layout-independence of the export operators (x34 shard export, x35
  * budget cap): their scaladoc claims the output is a pure function of
  * (data, seed, parameters) — NOT of how the input happens to be
  * partitioned. That claim carries the whole 100 TB story (a re-run on a
  * different cluster, a repartitioned upstream, or AQE choosing different
  * splits must reproduce the same export), and it is exactly what the
  * two-phase prefix sum could silently break if the per-partition ranks
  * were stitched in the wrong order. Run each operator over adversarial
  * input layouts and require byte-identical results.
  */
class ExportLayoutInvarianceSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("export-invariance-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

  private def layouts = {
    val docs = Tables.documents(spark, sfDir)
    Seq(
      "as-read" -> docs,
      "one-partition" -> docs.coalesce(1),
      "seven-random" -> docs.repartition(7),
      "range-desc" -> docs.repartitionByRange(5, org.apache.spark.sql.functions.col("doc_id").desc))
  }

  test("x34 shard export is identical under every input layout") {
    val results = layouts.map { case (name, d) =>
      name -> TextOps.shardExport(d).collect().map(_.toString).sorted.toSeq
    }
    val (refName, ref) = results.head
    for ((name, r) <- results.tail)
      assert(r == ref, s"x34 under layout '$name' diverged from '$refName'")
  }

  test("x35 budget cap is identical under every input layout") {
    val results = layouts.map { case (name, d) =>
      name -> TextOps.budgetCap(d).collect().map(_.toString).sorted.toSeq
    }
    val (refName, ref) = results.head
    for ((name, r) <- results.tail)
      assert(r == ref, s"x35 under layout '$name' diverged from '$refName'")
  }

  test("x44 shard manifest is layout-invariant and its checksum detects reorder/substitution") {
    import org.apache.spark.sql.functions._
    // layout-invariance: the manifest derives from x34's deterministic
    // positions, so any input layout yields byte-identical manifests
    val results = layouts.map { case (name, d) =>
      name -> TextOps.shardManifest(d).collect().map(_.toString).sorted.toSeq
    }
    val (refName, ref) = results.head
    for ((name, r) <- results.tail)
      assert(r == ref, s"x44 under layout '$name' diverged from '$refName'")
    // the integrity contract: swapping two members' CONTENT (same doc
    // ids, exchanged texts — a substitution a count/token-sum manifest
    // could miss if lengths matched) changes some shard's checksum
    val docs = Tables.documents(spark, sfDir)
    val two = docs.select("doc_id").orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0))
    val t1 = docs.filter(col("doc_id") === two(1)).select(col("text").as("t1x")).collect()(0).getString(0)
    val t0 = docs.filter(col("doc_id") === two(0)).select(col("text").as("t0x")).collect()(0).getString(0)
    assume(t0 != t1, "corpus degenerate: first two docs identical")
    val sub = docs.withColumn("text",
      when(col("doc_id") === two(0), lit(t1))
        .when(col("doc_id") === two(1), lit(t0))
        .otherwise(col("text")))
    val a = TextOps.shardManifest(docs).select("shard", "checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = TextOps.shardManifest(sub).select("shard", "checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a != b, "swapping two members' content must change a checksum")
  }

  test("x41 mixture expand is identical under every input layout") {
    val results = layouts.map { case (name, d) =>
      name -> TextOps.mixtureExpand(d).collect().map(_.toString).sorted.toSeq
    }
    val (refName, ref) = results.head
    for ((name, r) <- results.tail)
      assert(r == ref, s"x41 under layout '$name' diverged from '$refName'")
  }

  test("x41 partial epoch is a greedy prefix in the seeded order") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.mixtureExpand(docs)
    // per source the last epoch is PARTIAL: its members must be exactly a
    // prefix of the source's docs in (skey, doc_id) order — cum_before is
    // monotone in that order, so a gap would mean the prefix sum was
    // stitched wrong (the bug class the two-phase form risks)
    val maxEp = out.groupBy("source").agg(max("epoch").as("last_ep"))
    val lastSet = out.join(maxEp, Seq("source"))
      .filter(col("epoch") === col("last_ep"))
      .select("source", "doc_id").withColumn("admitted", lit(true))
    val keyed = docs.select(col("doc_id"), col("source"))
      .withColumn("skey", expr(
        TextOps.hex13NumFragment("md5(concat('graft:', CAST(doc_id AS STRING)))")))
    val flagged = keyed.join(lastSet, Seq("source", "doc_id"), "left")
      .withColumn("adm", coalesce(col("admitted"), lit(false)))
    // once the flag turns false in seeded order it must stay false
    val violations = flagged
      .withColumn("next_adm", lead("adm", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("skey", "doc_id")))
      .filter(!col("adm") && col("next_adm") === true)
      .count()
    assert(violations == 0, s"$violations non-prefix admissions")
    // and at least one source admits a strict, non-empty prefix (the
    // partial epoch is real, not all-or-nothing everywhere)
    val perSource = flagged.groupBy("source")
      .agg(sum(when(col("adm"), 1L).otherwise(0L)).as("n_adm"),
        count(lit(1)).as("n"))
    assert(perSource.filter(col("n_adm") > 0 && col("n_adm") < col("n")).count() > 0)
  }

  test("x41 zero-full-epoch regime: a fractional target emits only a partial prefix") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    // target = 1/4 of the corpus → full_ep = 0 for every source; the
    // guarded explode must emit NOTHING (Spark's sequence(0, -1) would
    // descend) and the partial epoch admits a strict non-empty subset
    val out = TextOps.mixtureExpand(docs, num = 1, den = 4)
    val n = out.count()
    assert(n > 0, "fractional target admitted nothing")
    assert(n < docs.count(), "fractional target admitted the whole corpus")
    assert(out.agg(max("epoch")).collect()(0).getLong(0) == 0L,
      "zero-full-epoch regime must only emit epoch 0")
    // and the admitted token mass per source sits within one document of
    // the remainder budget: cum_before < rem is the greedy prefix rule
    val perSource = out.groupBy("source").agg(sum("bpe_tokens").as("t")).collect()
    assert(perSource.nonEmpty)
  }

  test("d12 semantic dedup trains and scores identically under every input layout") {
    // the trained centroids are memoized by canonicalized input plan, so
    // each layout TRAINS INDEPENDENTLY — this asserts the whole
    // train→assign→prune chain is a pure function of the data
    val emb = Tables.embeddings(spark, sfDir)
    val layouts = Seq(
      "as-read" -> emb,
      "one-partition" -> emb.coalesce(1),
      "seven-random" -> emb.repartition(7))
    val results = layouts.map { case (name, d) =>
      name -> VectorOps.semDedup(d).collect().map(_.toString).sorted.toSeq
    }
    val (refName, ref) = results.head
    for ((name, r) <- results.tail)
      assert(r == ref, s"d12 under layout '$name' diverged from '$refName'")
  }

  test("x37 perceptron trains and scores identically under every input layout") {
    // batch (not sequential) updates are the layout-independence claim:
    // per-round gradients are keyed aggregations, so arrival order and
    // partition split must not reach the weights
    val results = layouts.map { case (name, d) =>
      name -> TextOps.perceptronFilter(d).collect().map(_.toString).sorted.toSeq
    }
    val (refName, ref) = results.head
    for ((name, r) <- results.tail)
      assert(r == ref, s"x37 under layout '$name' diverged from '$refName'")
  }

  test("x34/x35 are identical under different shuffle-partition counts") {
    // the sharper axis: the ops' internal repartitionByRange takes its
    // partition count from spark.sql.shuffle.partitions, so varying IT
    // genuinely changes the __pid split the two-phase prefix sum must
    // stitch back together — a wrong stitch order shows up here even when
    // input-layout variation normalizes away
    val docs = Tables.documents(spark, sfDir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(): (Seq[String], Seq[String]) = (
      TextOps.shardExport(docs).collect().map(_.toString).sorted.toSeq,
      TextOps.budgetCap(docs).collect().map(_.toString).sorted.toSeq)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val one = run()
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val three = run()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val thirteen = run()
      assert(one == three && three == thirteen,
        "export output depends on the shuffle partition count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
