package graft

import org.apache.spark.sql.SparkSession

/** Shared session-level performance configuration for the bench/tool
  * mains (round 15, optimization round — guide §2.2 "fewer, larger
  * reduce partitions" / §9 baseline config).
  *
  * Why: this sandbox charges a large fixed CPU cost per shuffle map
  * task (measured ~0.1–0.16 s executor CPU per task: sorting 1 M
  * checkpointed rows cost 10.7 s CPU from 64 input partitions vs
  * 1.7 s from 8, identical bytes), so partition COUNT — not bytes —
  * dominated half the board. The fix is the production-correct one,
  * not a local[32] constant: let AQE coalesce post-shuffle partitions
  * by SIZE.
  *
  *  - `parallelismFirst=false`: honor `advisoryPartitionSizeInBytes`
  *    instead of keeping ≥ default-parallelism partitions of ≥ 1 MB.
  *    The Spark tuning guide itself recommends false in production.
  *  - advisory size 64 MB (env `SPARK_GRAFT_ADVISORY_MB` overrides):
  *    scale-ADAPTIVE — at sf0.1 every tiny exchange collapses to one
  *    partition; at 100 TB the same setting yields thousands of
  *    partitions. Nothing is tuned to the local core count.
  *  - `canChangeCachedPlanOutputPartitioning=true`: extends the same
  *    AQE coalescing to InMemoryRelation materialization — operator-
  *    internal caches (dedup mask groups, ANN probe state) otherwise
  *    materialize at spark.sql.shuffle.partitions tiny partitions and
  *    every downstream exchange pays the per-map-task floor for them.
  *
  * Operators whose per-partition COMPUTE (not bytes) is the cost pin
  * their parallelism explicitly with repartition(N, keys...) — AQE
  * never overrides a user-specified partition count — so size-based
  * coalescing cannot serialize them (Dedup.blockedMaskPairs).
  */
object Sessions {
  def perf(b: SparkSession.Builder): SparkSession.Builder = {
    val advisoryMb = sys.env.get("SPARK_GRAFT_ADVISORY_MB")
      .flatMap(_.trim.toIntOption).getOrElse(64)
    // The dominant fix (jstack-sampled root cause): the BYPASS shuffle
    // writer opens one file PER REDUCE PARTITION per map task and then
    // concatenates them with NIO transferTo (mmap/unmap per chunk) —
    // this sandbox charges ~7 s CPU to a 32→32-partition shuffle of
    // 1 M (long,long) rows that way. Below the threshold Spark uses
    // the sort-based writer (ONE file + index per map task): measured
    // 0.44 s → 0.15 s wall and 7.0 s → 1.0 s CPU per shuffle on the
    // same data. The sort writer is also what every R>200 production
    // shuffle uses anyway — forcing it everywhere is the scale shape,
    // not a local tweak.
    val out = b
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
    if (sys.env.get("SPARK_GRAFT_COALESCE").contains("off")) out
    else out
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${advisoryMb}m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
  }
}
