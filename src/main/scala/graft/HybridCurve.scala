package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** ss11 OPERATING-POINT curve (round 11 — VERDICT r10 #9): sweep
  * hybridProbe's two candidate-recall knobs — IVF nprobe (dense
  * probe width) × token df-cap (lexical posting width) — against the
  * exhaustive hybridTopK answer, ss14-style. Every leg of both paths
  * is deterministic, so the recall figures are stable run-to-run and
  * the SimilaritySpec floor can sit just under the chosen operating
  * point instead of the historical ≥ 0.5 placeholder.
  *
  * `runMain graft.HybridCurve [sfDir] [k]` — prints one markdown
  * table: recall@k of probe vs exhaustive per (nprobe, dfCap), plus
  * the candidate count per cell (the price of that recall; the
  * pruning ratio is what the probe exists for).
  */
object HybridCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nQueries = 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.broadcastTimeout", "1200")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val ivf = java.nio.file.Files.createTempDirectory("graft-hybcurve").toString
    Similarity.ivfWriteIndex(emb, ivf)
    val exact = Similarity.hybridTopK(docs, emb, nQueries, k)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"| nprobe | dfCap | recall@$k | candidates |")
    println(s"| --- | --- | --- | --- |")
    for (np <- Seq(1, 2, 4, 8, 16); cap <- Seq(16, 64, 256)) {
      val probe = Similarity.hybridProbe(spark, docs, emb, ivf, nQueries, k,
        nprobe = np, dfCap = cap)
      val hits = probe.collect().map(r => (r.getLong(0), r.getLong(2)))
        .count(exact.contains)
      val nCand = Similarity.hybridCandidatesOf(spark, docs, emb, ivf, nQueries,
        nprobe = np, dfCap = cap).count()
      println(f"| $np | $cap | ${hits.toDouble / exact.size}%.3f | $nCand |")
    }
    spark.stop()
  }
}
