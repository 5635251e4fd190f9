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

  test("indexCompact: LSH bucket dirs collapse to targeted files; probe ≡ pre-compaction; pruning intact") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, Sf0001)
    val path = Files.createTempDirectory("graft-idxcompact").toString
    // base build + two delta appends — each append lands one more file
    // in every touched bucket dir (the commit-bound LSH shape
    // DeltaBench flagged)
    Similarity.lshWriteIndex(emb.filter(col("vec_id") % 4 =!= 0), path, 64)
    Similarity.lshAppendDelta(emb.filter(col("vec_id") % 8 === 0), path, 64)
    Similarity.lshAppendDelta(emb.filter(col("vec_id") % 8 === 4), path, 64)
    def bucketFiles(): Map[String, Int] =
      new java.io.File(s"$path/buckets").listFiles().toSeq
        .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = bucketFiles()
    assert(before.values.exists(_ >= 3), s"appends did not fragment: $before")
    val q = emb.filter(col("vec_id") < 5)
    val probe0 = Similarity.lshProbeIndex(spark, path, q, 64, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val rewritten = Compact.compactIndex(spark, s"$path/buckets")
    assert(rewritten.nonEmpty)
    val after = bucketFiles()
    assert(after.keySet === before.keySet, "compaction changed the partition dirs")
    assert(after.values.forall(_ === 1), s"files not byte-targeted down: $after")
    assert(after.values.sum < before.values.sum)
    // probe is BYTE-IDENTICAL — compaction moved rows between files,
    // nothing else
    val probe1 = Similarity.lshProbeIndex(spark, path, q, 64, 10)
    assert(probe1.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq === probe0)
    // and planning-time partition pruning still fires on the compacted
    // layout — the dirs kept their bucket= names
    val scanLine = probe1.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scanLine.exists(_.contains("PartitionFilters: [bucket#")),
      s"pruning lost after compaction:\n${scanLine.mkString("\n")}")
    // idempotent: a second pass finds nothing to rewrite
    assert(Compact.compactIndex(spark, s"$path/buckets").isEmpty)
  }

  test("indexCompact: unpartitioned shingle sh/ compacts in place; probe ≡; trained df/ untouched") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, Sf0001)
    val path = Files.createTempDirectory("graft-shcompact").toString
    Dedup.shingleWriteIndex(docs.filter(col("doc_id") % 4 =!= 0), 1, path)
    Dedup.shingleAppendDelta(docs.filter(col("doc_id") % 8 === 0), 1, path)
    Dedup.shingleAppendDelta(docs.filter(col("doc_id") % 8 === 4), 1, path)
    def shFiles(): Int = new java.io.File(s"$path/sh").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = shFiles()
    val dfMtime = new java.io.File(s"$path/df").lastModified()
    val probe0 = Dedup.ngramJaccardProbe(spark, path, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val rewritten = Compact.compactIndex(spark, s"$path/sh")
    assert(rewritten.nonEmpty && shFiles() < before)
    assert(Dedup.ngramJaccardProbe(spark, path, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq === probe0)
    // the trained state (df/ — the total order every array was sorted
    // under) is a sibling the pass never names
    assert(new java.io.File(s"$path/df").lastModified() === dfMtime)
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
