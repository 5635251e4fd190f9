package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, sum => ssum, xxhash64}

import graft.sources.Compact

/** Compaction: many small files → few size-targeted files, content
  * identical; clustered mode produces disjoint per-file key ranges. */
class CompactSpec extends SparkTestBase {

  private def contentHash(path: String): java.math.BigDecimal =
    spark.read.parquet(path)
      .agg(ssum(xxhash64(col("doc_id"), col("text"), col("lang")).cast("decimal(38,0)")))
      .head().getDecimal(0)

  test("compaction reduces file count, preserves rows and content") {
    val base = Files.createTempDirectory("graft-compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    Tables.documents(spark, Sf0001).repartition(50)
      .write.mode("overwrite").parquet(in)
    val inFiles = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(inFiles === 50)

    // target ≈ 1/3 of the input → expect 3 output files
    val target = math.max(1L, Compact.dataBytes(spark, in) / 3)
    val n = Compact.compact(spark, in, out, target)
    val outFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles === n && n >= 2 && n <= 4, s"n=$n outFiles=$outFiles")
    assert(spark.read.parquet(out).count() === spark.read.parquet(in).count())
    assert(contentHash(out) === contentHash(in))
  }

  test("clustered compaction yields disjoint per-file doc_id ranges") {
    val base = Files.createTempDirectory("graft-compact-cl").toString
    val in = s"$base/in"
    val out = s"$base/out"
    Tables.documents(spark, Sf0001).repartition(20)
      .write.mode("overwrite").parquet(in)
    Compact.compact(spark, in, out,
      math.max(1L, Compact.dataBytes(spark, in) / 4), clusterBy = Seq("doc_id"))
    // per-file [min,max] of the clustering key must not overlap — that
    // is exactly what lets parquet stats skip whole files on range scans
    import org.apache.spark.sql.functions.{input_file_name, max => smax, min => smin}
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(smin(col("doc_id")).as("lo"), smax(col("doc_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ =>
    }
    assert(contentHash(out) === contentHash(in))
  }
}
