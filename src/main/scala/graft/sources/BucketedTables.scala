package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the shuffle-amortization tool for 100 TB.
  *
  * A join or aggregation on a bucketed table's bucket key needs NO
  * shuffle: Spark's FileSourceScanExec reports the bucketing as its
  * output partitioning, so a SortMergeJoin of two tables bucketed by
  * the same key into the same bucket count plans with zero Exchange
  * operators on either side, and a groupBy on the bucket key skips its
  * exchange too. The one-time shuffle is paid at WRITE time and then
  * amortized over every downstream query — the right trade for fact
  * tables that are joined on the same key (orderkey, user_id, doc_id)
  * by many consumers. `sortBy` within buckets additionally lets the
  * merge join skip its per-partition sort when each bucket lands in
  * one file.
  *
  * Bucket count is a layout commitment: pick it so one bucket of the
  * LARGEST co-bucketed table fits an executor core's working set at
  * full scale (e.g. ~128 MB–1 GB per bucket), and use the same count
  * for every table in the co-location group — differing counts force a
  * shuffle again (Spark can only coalesce when one count divides the
  * other, spark.sql.bucketing.coalesceBucketsInJoin).
  */
object BucketedTables {

  /** Write `df` as an external bucketed parquet table at `path`,
    * registered as `table` in the session catalog. Bucketing metadata
    * lives in the catalog (parquet itself has no bucket notion), so
    * downstream readers must go through `spark.table(table)`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
