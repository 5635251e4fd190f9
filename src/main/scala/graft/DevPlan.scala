package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: dumps the executed-plan string of one registry query
  * (`runMain graft.DevPlan <queryName> [sfDir]`) — the plan-pin
  * calibration loop Dev.scala's row counts don't cover. */
object DevPlan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DevPlan <queryName> [sfDir]")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, d)
    println("=== OPTIMIZED LOGICAL ===")
    println(df.queryExecution.optimizedPlan.toString)
    val n = df.collect().length
    println(s"=== EXECUTED (rows=$n) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
