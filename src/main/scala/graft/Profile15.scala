package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 measurement scratchpad (optimization round): dissects the
  * dedup mask-path pipeline stage by stage under the bench session
  * config. Dev-only diagnostics — not part of the driver contract.
  * `runMain graft.Profile15 [sfDir]` */
object Profile15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.perf(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNow = BenchCpu.install(spark)
    def timed[T](label: String)(f: => T): T = {
      var r: T = null.asInstanceOf[T]
      for (i <- 1 to 2) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val c0 = cpuNow(); val t0 = System.nanoTime()
        r = f
        println(f"[p15] $label#$i: ${(System.nanoTime() - t0) / 1e9}%.2fs cpu=${(cpuNow() - c0) / 1e9}%.2fs")
      }
      r
    }

    val idx = graft.queries.PipelineQueries.cachedShingleIndex(spark, sfDir)
    timed("masks scan count")(
      spark.read.parquet(s"$idx/masks").count())
    timed("groups agg count")(
      spark.read.parquet(s"$idx/masks").groupBy("comp", "mask")
        .agg(collect_list(col("doc_id")).as("ids")).count())
    timed("groups agg noop")(
      spark.read.parquet(s"$idx/masks").groupBy("comp", "mask")
        .agg(collect_list(col("doc_id")).as("ids"))
        .write.format("noop").mode("overwrite").save())
    timed("pairs (no sort) noop")(
      Bench.sink(graft.operators.Dedup.ngramJaccardProbePairs(spark, idx, 0.9)))
    timed("dd2 full noop")(
      Bench.sink(SparkEntry.queries("dd2_ngram_jaccard")(spark, sfDir)))
    spark.stop()
  }
}
