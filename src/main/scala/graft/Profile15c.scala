package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repeated small shuffles to sample with jstack (round 15). */
object Profile15c {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("P15C_TRANSFERTO").foreach(v => b = b.config("spark.file.transferTo", v))
    sys.env.get("P15C_BYPASS").foreach(v => b = b.config("spark.shuffle.sort.bypassMergeThreshold", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNow = BenchCpu.install(spark)
    val df = spark.range(1000000)
      .select(pmod(xxhash64(col("id")), lit(100000)).as("k"), col("id").as("v"))
      .repartition(32).localCheckpoint()
    df.count()
    println(s"[p15c] pid=${ProcessHandle.current().pid()} sampling window starts")
    val c0 = cpuNow(); val t0 = System.nanoTime()
    var i = 0
    while ((System.nanoTime() - t0) / 1e9 < 45) {
      df.repartition(32, col("k")).write.format("noop").mode("overwrite").save()
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[p15c] $i shuffles in $dt%.1fs cpu=${(cpuNow() - c0) / 1e9}%.1fs (${dt / i}%.3fs each)")
    spark.stop()
  }
}
