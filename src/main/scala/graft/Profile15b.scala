package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Config A/B probe for the round-15 optimization: run registry
  * queries under the session config selected by env knobs and report
  * wall/cpu. `runMain graft.Profile15b <sfDir> <name>...`
  * Env: SPARK_GRAFT_AB=coalesce enables size-based AQE coalescing. */
object Profile15b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ab = sys.env.getOrElse("SPARK_GRAFT_AB", "base")
    var b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.broadcastTimeout", "1200")
      .config("spark.ui.enabled", "false")
    if (ab == "coalesce")
      b = b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    if (ab == "coalesce2")
      b = b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNow = BenchCpu.install(spark)
    args.drop(1).foreach { name =>
      for (i <- 1 to 2) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val c0 = cpuNow(); val t0 = System.nanoTime()
        Bench.sink(SparkEntry.queries(name)(spark, sfDir))
        println(f"[ab:$ab] $name#$i ${(System.nanoTime() - t0) / 1e9}%.2fs " +
          f"cpu=${(cpuNow() - c0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
