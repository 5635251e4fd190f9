package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance pass every 100 TB
  * deployment runs continuously. Streaming ingest and fine-grained
  * partition writes leave thousands of KB-scale files per directory;
  * each one costs a scan task, a name-node entry, and a footer read,
  * so scan latency degrades long before data volume does.
  *
  * The rewrite targets a byte budget per output file. Input size comes
  * from the FILE SYSTEM (one listing, no data scan), and the rewrite
  * is ONE round-robin repartition: `repartition(n)` spreads rows
  * evenly, so output files are uniform even when the input sizes are
  * wildly skewed — `coalesce(n)` would only glue adjacent inputs,
  * keeping the skew and (worse) collapsing upstream parallelism.
  *
  * `clusterBy` trades the round-robin for a range partition + in-file
  * sort on the given columns: output files then cover disjoint key
  * ranges, so parquet min/max stats let later scans skip whole files
  * for range predicates on those columns (poor man's Z-order; one
  * clustering dimension). The extra cost is the range exchange's
  * sampling pass.
  */
object Compact {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  /** Total on-disk bytes of the data files under `path` (one FS
    * listing; hidden/metadata files excluded). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Rewrite the parquet directory `inPath` to `outPath` with
    * ~`targetBytes` per output file. Returns the output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = DefaultTargetBytes,
      clusterBy: Seq[String] = Nil): Int = {
    val n = math.max(1L, (dataBytes(spark, inPath) + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    val out =
      if (clusterBy.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    out.write.mode("overwrite").parquet(outPath)
    n
  }
}
