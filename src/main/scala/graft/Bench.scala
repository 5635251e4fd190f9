package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Full-result sink (round 15 — VERDICT r14 #1). `count()` let
    * Catalyst prune any work whose result doesn't affect the row
    * count: map-heavy entries (tx7's normalize, tx9's PII regexes,
    * mm4's resize, every pure per-row transform) billed at near-zero,
    * and tx11's train-side semi-join read ~0.2 s under count() vs
    * 10.3 s honest — the headline artifact systematically
    * under-measured exactly the shapes a 100 TB pipeline pays for.
    * The noop data source (ScaleBench's sink since round 13)
    * materializes EVERY output column through the full physical plan
    * with no write-side cost. BENCH_r15 is therefore re-baselined:
    * r15-vs-r13/r14 walls are NOT comparable; BASELINE.json carries
    * both sink generations side by side (VERDICT r14 #8). */
  private[graft] def sink(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.perf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the contended container intermittently blows the 300 s default
      // during broadcast exchanges — not a plan problem, raise it
      .config("spark.sql.broadcastTimeout", "1200")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Executor CPU-time accounting (BenchCpu, shared with BenchOne):
    // BENCH_LAST carries wall AND cpu, and regression reads gate on
    // cpu when wall is ambiguous (VERDICT r11 #1's host-window noise).
    val cpuNow = BenchCpu.install(spark)
    // Warm-up (untimed): JIT + codegen caches + file-system cache, so
    // the first timed query doesn't absorb JVM start-up cost.
    try sink(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => () }
    // Amortized infrastructure (TIMED SEPARATELY): build-if-missing
    // derived layouts/indexes. Folding a cold index build into the
    // first query that touches it misreads one-off build cost as query
    // cost; at 100 TB these are rebuilt on corpus refresh, not per
    // query, so the bench reports them as their own line.
    // A prebuild failure is non-fatal: queries fall back to their own
    // build-if-missing path (the cost just lands on them, as before).
    val tL = System.nanoTime()
    try graft.queries.PipelineQueries.prebuildLayouts(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] layout prebuild FAILED: ${e.getMessage}")
    }
    val layoutSec = (System.nanoTime() - tL) / 1e9
    // SPARK_GRAFT_BENCH_REPS=N → per-query min-of-N (DEFAULT 2). The
    // container's host contention swings single samples 3–20×, which
    // made one-pass round-over-round artifacts nearly meaningless for
    // regression detection (round 6: two same-code passes read 147 s
    // and 626 s); min-of-N recovers the plan's intrinsic cost at N×
    // wall-clock, and the default applies to the driver's artifact,
    // which sets no env. Reps run back-to-back per query (not
    // pass-by-pass) so each query's samples share one cache state.
    // malformed values fail LOUDLY with the env var named instead of
    // crashing later with a bare NumberFormatException (ADVICE r7)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map { v =>
      v.trim.toIntOption.getOrElse(
        sys.error(s"SPARK_GRAFT_BENCH_REPS must be an integer, got '$v'"))
    }.getOrElse(2).max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to reps).map { _ =>
        spark.catalog.clearCache() // operator-internal caches must not tax later queries
        // localCheckpoint RDDs (iterative ops) bypass the catalog cache;
        // free them too or repeated runs degrade under memory pressure
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val c0 = cpuNow()
        val t0 = System.nanoTime()
        // A failed query must be loud: recording its ~70 ms of
        // throw-latency as a real time once hid a 15-query breakage for
        // two rounds. Keep the time but carry the failure alongside.
        val ok = try { sink(fn(spark, sfDir)); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
                   false
                 }
        ((System.nanoTime() - t0) / 1e9, (cpuNow() - c0) / 1e9, ok)
      }
      // the CPU figure reported is the min-wall rep's — the (wall, cpu)
      // pair is one observation; pairing min wall with another rep's
      // cpu would report a run that never happened
      val best = samples.minBy(_._1)
      (name, best._1, best._2, samples.forall(_._3))
    }
    val failed = results.collect { case (n, _, _, false) => n }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val cpuQs = results.map { case (k, _, c, _) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val cpuTotal = results.map(_._3).sum
    // The driver captures only a fixed-size stdout tail: a final line
    // carrying ~90 per-query entries (~4 KB) gets its head cut off and
    // fails to parse. So the FINAL stdout line is compact totals-only;
    // the full per-query map lives exclusively in BENCH_LAST.json.
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_total_sec":$cpuTotal,"layout_build_sec":$layoutSec,"reps":$reps,"queries":$qs,"cpu_sec":$cpuQs,"n_failed":${failed.size},"failed":$failedJson,"sf":"$sfDir"}"""
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_total_sec":$cpuTotal,"layout_build_sec":$layoutSec,"reps":$reps,"n_queries":${results.size},"n_failed":${failed.size},"sf":"$sfDir"}"""
    // Stop first: Spark shutdown logs (stderr) can't then interleave
    // after the JSON line the driver parses.
    spark.stop()
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LAST.json"),
      full.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(compact)
    if (failed.nonEmpty) sys.exit(1)
  }
}
