package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, PipelineQueries, SqlQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) / §7 (plan). */
object SparkEntry {

  private def registry: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    CoreQueries.all ++ SqlQueries.all ++ PipelineQueries.all ++ StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, fn, _) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-specific hashing/ANN — gated by specs instead). */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, _, sql) if sql != null => name -> sql }.toMap
}
