package graft.data

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins.
  *
  * At 100 TB the dominant cost of a fact-fact join (lineitem⋈orders,
  * envelope⋈envelope across days) is the shuffle of both sides. Writing
  * the tables bucketed AND sorted by the join key pays that shuffle once
  * at ingest: every subsequent equi-join on the bucket key with a matching
  * bucket count reads co-located buckets and sort-merge-joins them with
  * ZERO exchanges in the plan (asserted by `BucketingSpec`). This is the
  * storage-layout analogue of the reference's per-topic partitioned
  * publish — order and placement decided at write time so readers never
  * re-shuffle.
  *
  * Bucket-count sizing: #buckets ≈ table_size / target_partition (e.g.
  * 100 TB / 256 MB ≈ 400k — cap to the cluster's file-count comfort and
  * keep it a common multiple across tables that join together, since only
  * equal (or divisible, with `spark.sql.bucketing.coalesceBucketsInJoin`)
  * bucket counts co-locate).
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed and sorted by
    * `bucketCol` (bucketing requires the table catalog — a path-only
    * parquet write cannot carry bucket metadata). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, bucketCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
