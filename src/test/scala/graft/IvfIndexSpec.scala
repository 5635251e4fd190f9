package graft

import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Materialized IVF index: partitioned layout, pruned probe reads. */
class IvfIndexSpec extends SparkTestBase {

  test("index write → probe equals inline ivfTopK and prunes partitions") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.ivfWriteIndex(emb, dir, nlist = 16, iters = 2)

    val probe = Similarity.ivfProbeIndex(spark, dir, q, k = 10, nprobe = 2)
    val inline = Similarity.ivfTopK(emb, q, dim = 64, k = 10,
      nlist = 16, nprobe = 2, iters = 2)
    assert(probe.collect().toSeq === inline.collect().toSeq)

    // partition pruning: the cid predicate must land in the scan's
    // PartitionFilters (directory-level pruning at planning time), not
    // as a post-scan data filter. (inputFiles can't show this — it
    // lists the relation's files before pruning.)
    val p = probe.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(l => l.contains("FileScan") && l.contains("vectors"))
    assert(scanLine.exists(_.contains("PartitionFilters: [cid#")),
      s"cid not a partition filter:\n$p")
    assert(scanLine.exists(l => l.contains(" IN (") || l.contains("cid#") && l.contains("=")),
      s"no pruning predicate on the vectors scan:\n$p")
  }

  test("PQ index write → probe equals inline pqTopK; scan reads only codes") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Similarity.pqWriteIndex(emb, dir, dim = 64)

    val probe = Similarity.pqProbeIndex(spark, dir, q, k = 10)
    val inline = Similarity.pqTopK(emb, q, dim = 64, k = 10)
    assert(probe.collect().toSeq === inline.collect().toSeq)

    // the probe's corpus-side scan must touch the code table only —
    // no file under the index path carries raw embeddings
    val p = probe.queryExecution.executedPlan.toString
    val codeScan = p.linesIterator.find(l => l.contains("FileScan") && l.contains("codes"))
    assert(codeScan.isDefined, s"no codes FileScan in probe plan:\n$p")
    assert(!codeScan.get.contains("embedding"), s"probe scan reads embeddings:\n$p")
  }

  test("LSH index write → probe equals inline lshTopK and prunes bucket dirs") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    Similarity.lshWriteIndex(emb, dir, dim = 64)

    val probe = Similarity.lshProbeIndex(spark, dir, q, dim = 64, k = 10)
    val inline = Similarity.lshTopK(emb, q, dim = 64, k = 10)
    assert(probe.collect().toSeq === inline.collect().toSeq)

    // the bucket predicate must prune directory-level at planning time
    val p = probe.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(l => l.contains("FileScan") && l.contains("buckets"))
    assert(scanLine.exists(_.contains("PartitionFilters: [bucket#")),
      s"bucket not a partition filter:\n$p")
  }

  test("IVF-PQ index write → probe equals inline ivfPqTopK; pruned code-only scan") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.ivfPqWriteIndex(emb, dir, dim = 64, nlist = 16)

    val probe = Similarity.ivfPqProbeIndex(spark, dir, q, k = 10, nprobe = 4)
    val inline = Similarity.ivfPqTopK(emb, q, dim = 64, k = 10,
      nlist = 16, nprobe = 4)
    assert(probe.collect().toSeq === inline.collect().toSeq)

    // both index properties at once: the cid predicate prunes partition
    // directories at planning time AND the pruned scan reads PQ codes,
    // never raw embeddings
    val p = probe.queryExecution.executedPlan.toString
    val codeScan = p.linesIterator.find(l => l.contains("FileScan") && l.contains("codes"))
    assert(codeScan.isDefined, s"no codes FileScan in probe plan:\n$p")
    assert(codeScan.exists(_.contains("PartitionFilters: [cid#")),
      s"cid not a partition filter:\n$p")
    assert(!codeScan.get.contains("embedding"), s"probe scan reads embeddings:\n$p")
  }
}
