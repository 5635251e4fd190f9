package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: runs every SparkEntry query at a small SF and prints
  * row counts (quick smoke before the full Verify + oracle pass).
  * With query names after the dir, prints those queries' ROWS instead
  * — the quick way to eyeball e.g. ss8's recall values at a scale
  * dir. */
object Dev {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (names.nonEmpty)
      names.foreach { n =>
        println(s"[dev] $n:")
        SparkEntry.queries(n)(spark, d).show(500, truncate = false)
      }
    else SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val n = fn(spark, d).count()
        println(f"[dev] $name%-22s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch {
        case e: Throwable =>
          println(s"[dev] $name FAILED: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
