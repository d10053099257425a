package graft.data

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The retrain→migrate leg of the IVF index lifecycle (s10/s12/s13 monitor;
  * s17 decides; this migrates): an incrementally-migrated
  * writeCellPartitioned layout must be ROW-IDENTICAL to a full re-write
  * under the retrained centroids while touching strictly fewer cell
  * directories — untouched cells' files stay byte-identical on disk.
  *
  * Scenario: the shipped layout is TRAINED on the base corpus; a topically
  * skewed ingest arrives (duplicates of a few base vectors — a crawl
  * increment is never uniform); retraining on base+ingest moves some
  * cells' membership and leaves others alone.
  */
class IvfMigrationSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("ivf-migration-spec", "8")
  private val sfDir = "/root/testdata/sf0.001"

  private def fileState(dir: String): Map[String, Seq[(String, Long)]] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).sorted.toSeq
      }.toMap
  }

  test("ingest migration under shipped centroids touches only the receiving cells") {
    val base = Tables.embeddings(spark, sfDir)
    val k = 8
    val it = 12
    // topically-skewed ingest: duplicates of ONE cell's base members (ids
    // shifted) — d14's increment discipline: the increment judges/assigns
    // under the BASE-trained centroids; retraining is a separate decision
    // the s17 report informs
    val baseA = VectorOps.trainedAssignment(base, k, it)
    val c0 = baseA.filter(col("vec_id") === 0).select("cell").collect()(0).getLong(0)
    val ingest = base.join(
        baseA.filter(col("cell") === c0).select("vec_id"), "vec_id")
      .withColumn("vec_id", col("vec_id") + 100000L)
      .select(base.columns.map(col).toIndexedSeq: _*)
    val corpus = base.unionByName(ingest)

    val layout = "/tmp/graft_ivf_migrate/layout"
    val full = "/tmp/graft_ivf_migrate/full"
    VectorOps.writeCellPartitionedTrained(base, layout, k, it)
    val before = fileState(layout)

    val (rewritten, emptied, totalCells) =
      VectorOps.migrateCellLayout(corpus, layout, k, it, trainOn = Some(base))
    // reference: a full re-write under the same (base-trained) centroids
    VectorOps.writeCellPartitionedTrained(corpus, full, k, it, trainOn = Some(base))

    val got = spark.read.parquet(layout).select("vec_id", "cell", "qv", "nn")
    val want = spark.read.parquet(full).select("vec_id", "cell", "qv", "nn")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "migrated layout must be row-identical to the full re-write")

    // incremental for real: exactly the ingest's cell rewritten — a
    // duplicate of a c0 member argmins back to c0 under identical
    // centroids (same dist2, same tiebreak)
    val touched = rewritten.toSet ++ emptied.toSet
    assert(touched == Set(c0),
      s"one-cell ingest must touch exactly cell $c0, got $touched")
    assert(touched.size < totalCells)

    // untouched cell directories are byte-identical (same files, same
    // mtimes) — never opened for write
    val after = fileState(layout)
    val untouched = before.keySet.filterNot(d =>
      touched.contains(d.stripPrefix("cell=").toLong))
    assert(untouched.nonEmpty)
    untouched.foreach { d =>
      assert(after(d) == before(d), s"untouched dir $d was rewritten")
    }
  }

  test("full-retrain migration stays row-identical to a full re-write") {
    val base = Tables.embeddings(spark, sfDir)
    val ingest = base.filter(col("vec_id") < 30)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val corpus = base.unionByName(ingest)
    val k = 8
    val it = 12

    val layout = "/tmp/graft_ivf_migrate/layout_rt"
    val full = "/tmp/graft_ivf_migrate/full_rt"
    VectorOps.writeCellPartitionedTrained(base, layout, k, it)
    // full retrain (trainOn = corpus): centroids drift, membership may
    // move broadly — the migration must stay exact regardless, and its
    // touched set must be EXACTLY the membership diff (no over-rewrite
    // hiding behind correctness, no under-rewrite hiding behind luck)
    val (rewritten, emptied, _) =
      VectorOps.migrateCellLayout(corpus, layout, k, it)
    VectorOps.writeCellPartitionedTrained(corpus, full, k, it)

    val got = spark.read.parquet(layout).select("vec_id", "cell", "qv", "nn")
    val want = spark.read.parquet(full).select("vec_id", "cell", "qv", "nn")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    val oldA = VectorOps.trainedAssignment(base, k, it)
      .select(col("vec_id"), col("cell").as("c_old"))
    val newA = VectorOps.trainedAssignment(corpus, k, it)
      .select(col("vec_id"), col("cell").as("c_new"))
    val expected = newA.join(oldA, Seq("vec_id"), "full")
      .filter(col("c_old").isNull || col("c_new").isNull ||
        col("c_old") =!= col("c_new"))
      .select(explode(array(col("c_old"), col("c_new"))).as("c"))
      .filter(col("c").isNotNull).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(rewritten.toSet ++ emptied.toSet == expected,
      s"touched ${rewritten.toSet ++ emptied.toSet} must equal diff $expected")
  }

  test("retrain report: movers reconcile and stable cells report no rewrite") {
    val e = Tables.embeddings(spark, sfDir)
    val rep = VectorOps.ivfRetrainReport(e, k = 4, maxIter = 24).collect()
    assert(rep.nonEmpty)
    // population conservation: both assignments cover the whole corpus
    val n = e.count()
    assert(rep.map(_.getAs[Long]("n_old")).sum == n)
    assert(rep.map(_.getAs[Long]("n_new")).sum == n)
    // total movers agree from both directions
    assert(rep.map(_.getAs[Long]("moved_in")).sum ==
      rep.map(_.getAs[Long]("moved_out")).sum)
    rep.foreach { r =>
      val needs = r.getAs[Boolean]("needs_rewrite")
      assert(needs == (r.getAs[Long]("moved_in") > 0 ||
        r.getAs[Long]("moved_out") > 0))
      // retained = n_old - moved_out = n_new - moved_in, both ways
      assert(r.getAs[Long]("n_old") - r.getAs[Long]("moved_out") ==
        r.getAs[Long]("n_new") - r.getAs[Long]("moved_in"))
    }
  }
}
