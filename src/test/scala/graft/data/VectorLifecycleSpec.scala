package graft.data

import graft.Tables
import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator consistency of the vector-index lifecycle: ONE trained
  * artifact set (base centroids + base keeper table) must drive the batch
  * increment, the streaming monitors and the admission check to the SAME
  * cluster view — the literal-projection assignment the streams use and
  * the broadcast-join assignment the batch uses are different plans over
  * the same integer algebra, and any divergence between them silently
  * corrupts every downstream verdict.
  */
class VectorLifecycleSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("vector-lifecycle-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

  test("batch increment and streaming monitor agree per cell over one trained index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb = Tables.embeddings(spark, sfDir)
    val baseMax = 25L
    val cent = VectorOps.convergedCentroids(
      emb.filter(col("vec_id") < baseMax), k = 4, maxIter = 24)

    // batch view of the increment's clusters: d14's c_id column (the
    // broadcast-join assignment against the SAME trained centroids)
    val batchCells = VectorOps.semDedupIncremental(emb, baseMaxId = baseMax, k = 4)
      .groupBy("c_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // streaming view: the drift monitor's literal-projection assignment
    // over the same increment and the same centroids
    val rows = emb.filter(col("vec_id") >= baseMax)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
      .map { case (id, e) => (id, e, 1786700000000000L + id * 1000L) }
    val input = MemoryStream[(Long, Seq[Float], Long)]
    val q = StreamingAnalytics.ivfIngestMonitor(
        input.toDF().toDF("vec_id", "embedding", "ts_us"), cent,
        windowLength = "60 minutes")
      .writeStream.format("memory").queryName("lifecycle_mon")
      .outputMode("complete").start()
    input.addData(rows)
    q.processAllAvailable()
    val streamCells = spark.table("lifecycle_mon")
      .groupBy("cell").agg(sum("n").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    assert(streamCells == batchCells,
      s"streaming literal-projection assignment diverged from the batch join:\n" +
        s"stream=$streamCells\nbatch=$batchCells")

    // and the keeper artifact is cluster-consistent with those centroids:
    // every keeper cluster id is a trained centroid id
    val keeperCells = VectorOps.semBaseKeepers(emb, baseMaxId = baseMax, k = 4)
      .select("b_cid").distinct().collect().map(_.getLong(0)).toSet
    assert(keeperCells.subsetOf(cent.map(_._1).toSet),
      s"keeper table references unknown clusters: $keeperCells")
  }
}
