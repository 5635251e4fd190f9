package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single place all table reads go through.
  *
  * Every loader is a plain parquet scan: Catalyst sees the scan node
  * directly, so filter pushdown / column pruning / partition pruning
  * work unimpeded. At 100 TB the same loaders point at a partitioned
  * parquet/iceberg root instead of a single file — nothing downstream
  * changes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark cannot map to a
    * timestamp type; read it as INT64 nanoseconds instead. Queries that
    * need a timestamp convert with exact integer arithmetic
    * (`timestamp_micros(ts div 1000)`) — double division would lose
    * precision at 1e18 ns. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
