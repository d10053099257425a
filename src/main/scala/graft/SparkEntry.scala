package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented SURVEY §2 operator (plus the
  * large-scale data-pipeline operators); `oracleSql` holds the equivalent
  * DuckDB SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query: the full CDC data-plane pipeline (source replay →
    * filters → explode → registry join → typed envelope) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    cdc.CdcOps.pipeline(Tables.events(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    cdc.CdcQueries.queries ++ cdc.CdcControlQueries.queries ++
      data.DataQueries.queries ++ data.RelationalQueries.queries ++
      streaming.ComposedQueries.queries

  def oracleSql: Map[String, String] =
    cdc.CdcQueries.oracle ++ cdc.CdcControlQueries.oracle ++
      data.DataQueries.oracle ++ data.RelationalQueries.oracle ++
      streaming.ComposedQueries.oracle
}
