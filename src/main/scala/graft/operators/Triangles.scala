package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented triangle enumeration over an undirected edge set.
  *
  * Input: distinct undirected edges as (u, v) with u < v (canonical id
  * order — the caller's dedup convention). Edges are re-oriented lo→hi
  * by DEGREE rank: rank(x) = (deg(x), x) is a strict total order, and
  * every edge points from the lower-ranked endpoint to the higher. A
  * triangle with ranks a ≺ b ≺ c then appears exactly once as the
  * wedge a→b→c closed by a→c, and the wedge join's cost is
  * Σ_b in(b)·out(b) over ORIENTED degrees, where degree orientation
  * bounds every out-degree by O(√m) (the arboricity argument) —
  * O(m^1.5) total, robust to power-law hubs. Orienting by raw id
  * instead leaves a low-id hub with out-degree ≈ deg and a
  * quadratic wedge set; that skew cliff is why this operator orients
  * by degree even though the final triangle SET (and therefore every
  * count) is identical under any total-order orientation.
  *
  * Scale shape: one degree aggregation + two equi-joins to attach
  * degrees, one wedge equi-join, one closing-edge semi-join — all
  * shuffle-hash-partitionable, no nested loops, AQE-skew-splittable.
  * The oriented edge set is localCheckpointed because it feeds three
  * plan inputs (both wedge sides + the closing probe); without it each
  * consumer replays the upstream edge derivation.
  */
object Triangles {

  /** Oriented (lo, hi) edges by (deg, id) rank from canonical (u, v)
    * edges. Exposed for specs that pin the orientation invariant. */
  def orient(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("u"), col("v"))
    val deg = e0.select(col("u").as("node")).union(e0.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    // u < v by id: on a degree tie the id order stands, so lo = u iff
    // deg(u) <= deg(v) — exactly rank(u) ≺ rank(v)
    e0.join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
      .select(
        when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("lo"),
        when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("hi"))
  }

  /** Per-node triangle participation counts (nodes in ≥1 triangle),
    * as (node, n_triangles). */
  def perNodeCounts(edges: DataFrame): DataFrame =
    perNodeCountsOriented(orient(edges).localCheckpoint())

  /** Skip the wedge Bloom pre-filter past this edge count: the capped
    * 2²⁶-bit filter falls under ~2 bits/key there and passes nearly
    * everything — pay the build for nothing. The plan stays correct
    * either way (the semi join is the exact gate); on a cluster with a
    * bigger broadcast budget this threshold and the bit cap rise
    * together. */
  private val MaxBloomKeys = 1L << 25

  /** The enumeration stage alone, over edges ALREADY oriented lo→hi by
    * (deg, id) rank — the probe path when the orientation comes off a
    * materialized layout (CoreQueries.copurchaseOriented): orientation
    * is corpus-static, so a write-once index pays the degree
    * aggregation + attach joins once per corpus version and every
    * triangle query starts at the wedge join. The parquet snapshot
    * plays the localCheckpoint's role for the three consumers.
    *
    * The closing semi join is preceded by a MAP-SIDE Bloom pre-filter
    * on the closing-edge key (q64's runtime-literal pattern: one
    * graft_bloom aggregate over the edge set → a driver byte-array
    * literal → graft_might_contain inside the wedge stage's codegen).
    * Measured motivation: the co-purchase graph at sf0.1 makes 49.2 M
    * wedges of which only 1.88 M close (26:1), so the semi join was
    * shuffling 26× more rows than survive it; the Bloom (sized ~16
    * bits/key, fpp ≪ 1%) drops non-closing wedges BEFORE the
    * exchange. Exactness is untouched — the semi join still verifies
    * every survivor; false positives only cost shuffle rows. The
    * filter is skipped above [[MaxBloomKeys]] edges where the capped
    * filter would saturate (graceful degradation to the plain plan —
    * the same size-capped trade Spark's own runtime row-level
    * filtering makes). */
  /** Edge count + (when under [[MaxBloomKeys]]) the wedge-closing
    * Bloom bytes for an oriented edge set. Runs TWO eager Spark jobs —
    * callers with a materialized layout should compute this once at
    * build time and persist it beside the edges (the co-purchase
    * layout's bloomstats/), passing the stored value to
    * [[perNodeCountsOriented]] instead of re-counting per query. */
  private[graft] def bloomStats(e: DataFrame): (Long, Option[Array[Byte]]) = {
    graft.functions.VectorFunctions.register(e.sparkSession)
    val m = e.count()
    val bf = if (m > 0 && m <= MaxBloomKeys) {
      var nb = 1 << 20
      while (nb < 16L * m && nb < (1 << 26)) nb <<= 1
      Some(e.agg(call_function("graft_bloom",
          xxhash64(col("lo"), col("hi")), lit(nb), lit(5)).as("bf"))
        .head().getAs[Array[Byte]](0))
    } else None
    (m, bf)
  }

  /** NOTE: with `stats` at its None default this runs [[bloomStats]]'s
    * two eager jobs at DataFrame-CONSTRUCTION time (merely building or
    * explaining the plan pays the Bloom build). Callers holding a
    * write-once layout pass the build-time stats instead (ADVICE r12). */
  def perNodeCountsOriented(e: DataFrame,
      stats: Option[(Long, Option[Array[Byte]])] = None): DataFrame = {
    graft.functions.VectorFunctions.register(e.sparkSession)
    val wedges0 = e.as("x").join(e.as("y"), col("x.hi") === col("y.lo"))
      .select(col("x.lo").as("a"), col("x.hi").as("b"), col("y.hi").as("c"))
    val (_, bfOpt) = stats.getOrElse(bloomStats(e))
    val wedges = bfOpt match {
      case Some(bf) => wedges0.filter(call_function("graft_might_contain", lit(bf),
        xxhash64(col("a"), col("c"))))
      case None => wedges0
    }
    val tri = wedges.join(e,
        wedges("a") === e("lo") && wedges("c") === e("hi"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
