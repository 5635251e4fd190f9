package graft
import org.apache.spark.sql.SparkSession

/** Time individual queries in isolation:
  * `runMain graft.BenchOne <sfDir> <name>...`
  * Env SPARK_GRAFT_REPEAT=N runs each query N times and reports the
  * minimum — single samples on this host swing 3–20× with container
  * contention, so minima are the only comparable statistic. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val spark = Sessions.perf(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the contended container intermittently blows the 300 s default
      // during broadcast exchanges — not a plan problem, raise it
      .config("spark.sql.broadcastTimeout", "1200")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-query executor CPU (BenchCpu, shared with Bench) — the wall
    // column alone hid dd6's 10× candidate-regeneration redundancy for
    // eleven rounds
    val cpuNow = BenchCpu.install(spark)
    args.drop(1).foreach { name =>
      // untimed row count for the log line; the TIMED runs use the
      // full-result noop sink (round 15 — VERDICT r14 #1: count()
      // pruned map-heavy work and semi-join build sides to near-zero)
      val n = try SparkEntry.queries(name)(spark, sfDir).count()
              catch { case _: Throwable => -1L }
      val times = (1 to repeat).map { _ =>
        spark.catalog.clearCache()
        // localCheckpoint RDDs bypass the catalog cache; free them too
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val c0 = cpuNow()
        val t0 = System.nanoTime()
        Bench.sink(SparkEntry.queries(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        val dc = (cpuNow() - c0) / 1e9
        println(f"[b1] $name rows=$n $dt%.1fs cpu=$dc%.1fs")
        (dt, dc)
      }
      if (repeat > 1) {
        val best = times.minBy(_._1)
        println(f"[b1min] $name ${best._1}%.1fs cpu=${best._2}%.1fs")
      }
    }
    spark.stop()
  }
}
