package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-point PageRank — the iterative graph-importance operator
  * (complements dd6's connected components and q70's Markov matrix in
  * the iterative family), with ss10's bit-exactness recipe: ALL
  * arithmetic is 64-bit integer on picorank units (1e-12 of total
  * rank), so a DuckDB oracle unrolling the same rounds hash-matches
  * exactly — no IEEE summation order, no decimal-cast divergence,
  * no libm.
  *
  * Per round, for damping d = num/den (default 85/100):
  *   r'(v) = (15e10 div N) + (num · Σ_{u→v} (r(u) div outdeg(u))) div den
  * Integer floor-division loses < 1 picorank per term — far below any
  * ranking-relevant signal — and both engines share the identical
  * floor semantics on non-negative operands (Spark `div`, DuckDB `//`).
  *
  * Scale shape: one shuffle join (edges ⋈ ranks on src) + one
  * partial-agg'd groupBy(dst) per round — the Pregel message pattern
  * expressed declaratively, so AQE handles hub skew like every other
  * hot-key join here. Rank state is one row per node; edges are the
  * only large table and are never mutated. The registry entry unrolls
  * a FIXED 2 rounds (oracle-able in plain SQL, ss10's unrolled-Lloyd
  * pattern); an iterate-to-convergence variant would reuse dd6's
  * checkpoint loop machinery unchanged.
  */
object PageRank {

  private val Unit_e12 = 1000000000000L // total rank in picorank units
  private val Base_e12 = 150000000000L  // (1 − d) · 1e12 for d = 0.85

  /** One synchronous round over `withDeg` = (node, outdeg, r). */
  private def round(withDeg: DataFrame, edges: DataFrame, n: Long): DataFrame = {
    val contrib = edges
      .join(withDeg.select(col("node").as("src"), col("outdeg"), col("r")), "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(expr("r div outdeg")).as("s"))
    withDeg.select(col("node"), col("outdeg"))
      .join(contrib, Seq("node"), "left")
      .select(col("node"), col("outdeg"),
        (lit(Base_e12 / n) + expr(s"(85 * coalesce(s, 0L)) div 100")).as("r"))
  }

  /** Ranks after `iters` rounds from a uniform start, over the
    * directed edge set (src, dst). Nodes = every src (callers wanting
    * sink nodes ranked should pre-symmetrize or add self-degree rows).
    * Returns (node, pr_e12: BIGINT picoranks, pagerank: DOUBLE). */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    // N is ONE bounded driver scalar (q64's runtime-literal pattern) —
    // baked into the plan as a literal so each round stays one join +
    // one aggregate, no scalar-subquery re-evaluation per row
    val n = deg.count()
    var r = deg.select(col("node"), col("outdeg"), lit(Unit_e12 / n).as("r"))
    for (_ <- 0 until iters) r = round(r, e, n)
    r.select(col("node"), col("r").as("pr_e12"),
      (col("r").cast("double") / 1e12).as("pagerank"))
  }
}
