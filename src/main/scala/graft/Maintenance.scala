package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Similarity}
import graft.sources.Compact

/** The NIGHTLY INDEX MAINTENANCE CYCLE — round 9's pieces wired into
  * the one pass a 100 TB deployment actually schedules, instead of
  * four tools a human remembers to run in the right order:
  *
  *   append (done upstream by the ingest job via `*AppendDelta`)
  *     → COMPACT   the fragmented data dirs (Compact.compactIndex —
  *                 file-count ceiling; LSH dirs degrade first)
  *     → OBSERVE   per-list centroid drift (Similarity.centroidDrift —
  *                 needs no query workload, unlike recall)
  *     → DECIDE    max drift vs the caller's threshold
  *     → ACT       ivfRecluster into a FRESH generation directory when
  *                 the threshold trips (bit-identical to a full
  *                 rebuild — the append history leaves no trace)
  *     → RECLAIM   Tables.layoutVacuum sweeps the superseded
  *                 generation (and any other stranded layout).
  *
  * Every step is individually spec-gated elsewhere; this module's own
  * spec pins the COMPOSITION: a quiet corpus compacts and keeps its
  * index (probe byte-identical), a drifted corpus triggers the
  * recluster arm and the new generation serves exactly the full
  * rebuild's answers. Decisions return as an audit log — a scheduler
  * alerts on "reclustered" lines, a dashboard plots the drift number.
  *
  * Why the act arm is IVF-only: IVF is the one index whose at-rest
  * rows carry the RAW vectors, so retraining needs nothing but the
  * index itself. PQ / IVF+PQ store lossy codes — re-deriving a
  * codebook from its own quantization would compound the error — so
  * their act stage is the upstream full build over the source corpus
  * (the same pqWriteIndex/ivfPqWriteIndex call the ingest pipeline
  * owns); LSH has no trained state at all (integer-mix hyperplanes),
  * so its cycle is compaction alone, like the shingle index's.
  */
object Maintenance {

  /** One cycle over a materialized IVF index at `path`. When max
    * per-list drift exceeds `driftThreshold` (embedding-space units —
    * tune against ss14's recall curve for the corpus), the index is
    * re-trained into `reclusterTo` and that path should replace
    * `path` for subsequent probes (generation swap — the caller owns
    * the pointer, e.g. a layoutKey-versioned directory name).
    * Returns the audit log. */
  /** Phase timer: every audit-log line carries its stage's wall
    * seconds, so DeltaBench's cycle-pricing table reads the split
    * straight off the one real dispatch (never a re-implemented
    * timing twin that could drift from the cycle it prices). */
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def ivfCycle(spark: SparkSession, path: String, reclusterTo: String,
      driftThreshold: Double): Seq[(String, String)] = {
    val (compacted, tC) = timed(Compact.compactIndex(spark, s"$path/vectors"))
    val (drift, tO) = timed(Similarity.centroidDrift(spark, path)
      .collect().map(r => (r.getInt(0), r.getDouble(2))))
    val maxDrift = if (drift.isEmpty) 0.0 else drift.map(_._2).max
    val log = Seq(
      "compact" -> f"${compacted.size} dir(s) rewritten ($tC%.2f s)",
      "observe" -> f"max_drift=$maxDrift%.6f over ${drift.length} lists ($tO%.2f s)")
    if (maxDrift > driftThreshold) {
      val (_, tA) = timed(Similarity.ivfRecluster(spark, path, reclusterTo))
      log :+ ("act" -> (s"reclustered -> $reclusterTo " +
        f"(drift $maxDrift > $driftThreshold) ($tA%.2f s)"))
    } else
      log :+ ("act" -> s"kept (drift $maxDrift <= $driftThreshold)")
  }

  /** One cycle over a materialized PQ (or IVF+PQ) index at `path`:
    * compact the code table, gauge the per-subspace quantization
    * residual of `appended` — the nightly batch's RAW rows, which the
    * ingest job still holds when it calls this — against the
    * build-time base residual (Similarity.pqResidualDrift), and ALERT
    * when any subspace's RMS residual exceeds `ratioThreshold` × its
    * base. The act arm is an alert, never a retrain: PQ rows store
    * lossy codes, so re-deriving a codebook from the index itself
    * would compound quantization error — the documented remedy is the
    * upstream full rebuild (pqWriteIndex over the source corpus) by
    * the job that owns the raw embeddings. The `rmse > thr × base`
    * form also decides sanely when base = 0 (a losslessly-coded
    * corpus: any nonzero residual fires). */
  def pqCycle(spark: SparkSession, path: String,
      appended: org.apache.spark.sql.DataFrame,
      ratioThreshold: Double): Seq[(String, String)] = {
    val (compacted, tC) = timed(Compact.compactIndex(spark, s"$path/codes"))
    val (drift, tO) = timed(Similarity.pqResidualDrift(spark, path, appended)
      .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3))))
    val worst = drift.filter { case (_, base, rmse) => rmse > ratioThreshold * base }
    val maxRmse = if (drift.isEmpty) 0.0 else drift.map(_._3).max
    val log = Seq(
      "compact" -> f"${compacted.size} dir(s) rewritten ($tC%.2f s)",
      "observe" -> (f"max_rmse=$maxRmse%.6f over ${drift.length} subspaces" +
        f" (${worst.length} past ${ratioThreshold}x base) ($tO%.2f s)"))
    if (worst.nonEmpty)
      log :+ ("act" -> ("ALERT upstream full rebuild required: subspaces " +
        s"${worst.map(_._1).mkString(",")} past ${ratioThreshold}x base residual " +
        "(retraining from codes is unsound)"))
    else
      log :+ ("act" -> s"kept (all ${drift.length} subspaces within ${ratioThreshold}x base)")
  }

  /** One cycle over a materialized shingle index: compaction only —
    * the shingle index has no trained-state drift (df staleness costs
    * prefix SELECTIVITY, never correctness — shingleAppendDelta's
    * contract — and is repriced at the corpus-refresh rebuild). */
  def shingleCycle(spark: SparkSession, path: String): Seq[(String, String)] = {
    val (n, tC) = timed {
      val sh = Compact.compactIndex(spark, s"$path/sh")
      val masks =
        if (new java.io.File(s"$path/masks").exists())
          Compact.compactIndex(spark, s"$path/masks")
        else Seq.empty
      sh.size + masks.size
    }
    Seq("compact" -> f"$n dir(s) rewritten ($tC%.2f s)")
  }

  /** One cycle over a materialized duplicate-span index (round 13):
    * compaction only — like the shingle cycle, the span index carries
    * no trained state. df/ rows are append-only increments the probe
    * and the append's promotion check SUM, so ingest fragmentation
    * (a few files per batch across spans/, df/, dupset/) is the only
    * decay; compaction preserves rows bit-for-bit and therefore every
    * probe answer. */
  def spanCycle(spark: SparkSession, path: String): Seq[(String, String)] = {
    val (n, tC) = timed {
      Seq("spans", "df", "dupset")
        .map(d => Compact.compactIndex(spark, s"$path/$d").size).sum
    }
    Seq("compact" -> f"$n dir(s) rewritten ($tC%.2f s)")
  }

  /** One cycle over an HNSW-lite graph index (round 13): compaction
    * only — append rows (delta nodes + reverse-edge patches) are
    * unioned by the probe per node, so compaction changes file
    * counts, never answers. Graph-quality drift from frozen standing
    * lists is repriced at the corpus-refresh rebuild; ss8's ss17_hnsw
    * recall row is the gauge that says when. */
  def hnswCycle(spark: SparkSession, path: String): Seq[(String, String)] = {
    val (n, tC) = timed(Compact.compactIndex(spark, s"$path/graph").size)
    Seq("compact" -> f"$n dir(s) rewritten ($tC%.2f s)")
  }

  /** `runMain graft.Maintenance ivf <path> <reclusterTo> [threshold]`,
    * `... pq <path> <appendedParquet> [ratioThreshold]` (the appended
    * batch's raw rows, as the ingest job staged them), or
    * `... shingle <path>` — the scheduler entry point; prints the
    * audit log, then vacuums superseded layout generations. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Maintenance ivf <path> <reclusterTo> [threshold] " +
      "| pq <path> <appendedParquet> [ratioThreshold] | shingle <path>")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val log = args(0) match {
      case "ivf" =>
        ivfCycle(spark, args(1), args(2),
          args.lift(3).map(_.toDouble).getOrElse(0.05))
      case "pq" =>
        pqCycle(spark, args(1), spark.read.parquet(args(2)),
          args.lift(3).map(_.toDouble).getOrElse(1.5))
      case "shingle" => shingleCycle(spark, args(1))
      case "span" => spanCycle(spark, args(1))
      case "hnsw" => hnswCycle(spark, args(1))
      case other => throw new IllegalArgumentException(s"unknown index kind $other")
    }
    log.foreach { case (step, msg) => println(s"[maintenance] $step: $msg") }
    val swept = Tables.layoutVacuum()
    println(s"[maintenance] vacuum: ${swept.size} superseded layout dir(s) removed")
  }
}
