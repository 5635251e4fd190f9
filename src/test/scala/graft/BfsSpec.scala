package graft

import org.apache.spark.sql.functions._

import graft.operators.Bfs
import graft.queries.CoreQueries

/** q75 bounded-radius multi-source BFS: fixture graphs with known hop
  * distances, a brute-force recomputation of the sf0.001 query, and
  * the loop invariants (radius cap, early drain, isolated seeds,
  * multi-seed minimum). The DuckDB recursive-CTE oracle is the strong
  * gate; these pin the operator's semantics on shapes the testdata
  * graph doesn't exercise. */
class BfsSpec extends SparkTestBase {

  private def sym(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    val e = pairs.toDF("src", "dst")
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def run(edges: org.apache.spark.sql.DataFrame, seeds: Seq[Long], k: Int) = {
    import spark.implicits._
    Bfs.hops(edges, seeds.toDF("node"), k).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("line graph: hop distance from one end, radius cap honored") {
    val line = sym((0L until 5L).map(i => (i, i + 1)))
    assert(run(line, Seq(0L), 3) === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
    // full radius reaches the far end
    assert(run(line, Seq(0L), 9)(5L) === 5)
  }

  test("multi-seed takes the minimum distance over seeds") {
    val line = sym((0L until 6L).map(i => (i, i + 1)))
    val got = run(line, Seq(0L, 6L), 3)
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3,
      6L -> 0, 5L -> 1, 4L -> 2))
  }

  test("disconnected component unreached; isolated seed still at hop 0") {
    val g = sym(Seq((0L, 1L), (10L, 11L)))
    val got = run(g, Seq(0L, 99L), 4)
    assert(got === Map(0L -> 0, 1L -> 1, 99L -> 0))
  }

  test("early drain: frontier empties before the cap without error") {
    val g = sym(Seq((0L, 1L)))
    assert(run(g, Seq(0L), 100) === Map(0L -> 0, 1L -> 1))
  }

  test("maxHops = 0 returns exactly the distinct seed set") {
    val g = sym(Seq((0L, 1L)))
    assert(run(g, Seq(0L, 0L, 7L), 0) === Map(0L -> 0, 7L -> 0))
  }

  test("directed edges are NOT symmetrized implicitly") {
    import spark.implicits._
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    assert(run(e, Seq(2L), 4) === Map(2L -> 0)) // no back-edges
  }

  test("q75 equals a driver-side brute-force BFS (sf0.001)") {
    val li = Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_partkey"))
    val co = li.as("a").join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_orderkey"), col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = co.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = Tables.part(spark, Sf0001)
      .filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet

    val dist = scala.collection.mutable.Map[Long, Long]()
    var frontier = seeds
    seeds.foreach(dist(_) = 0L)
    for (d <- 1 to 4) {
      frontier = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty[Long]))
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = d.toLong)
    }

    val got = CoreQueries.q75BfsHops(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === dist.toMap)
    assert(got.values.toSet.subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
  }

  test("q76 listagg: sorted, comma-joined, count consistent") {
    val rows = CoreQueries.q76Listagg(spark, Sf0001).collect()
    val nationsWithSuppliers = Tables.supplier(spark, Sf0001)
      .select(col("s_nationkey")).distinct().count()
    assert(rows.length.toLong === nationsWithSuppliers)
    rows.foreach { r =>
      val names = r.getString(2).split(',')
      assert(names.length.toLong === r.getLong(1))
      assert(names.sorted.sameElements(names)) // deterministic order
    }
  }

  test("q77 interval union: covered time within [10 min, span + 10 min] per user") {
    val rows = CoreQueries.q77IntervalUnion(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val tenMin = 600000000000L
    val spans = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"))
      .agg((max(col("ts")) - min(col("ts"))).as("span"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (span, n) = spans(r.getLong(0))
      val covered = r.getLong(2)
      assert(covered >= tenMin)                     // at least one interval
      assert(covered <= span + tenMin)              // union ≤ total span
      assert(covered <= n * tenMin)                 // union ≤ sum of intervals
      assert(r.getLong(1) >= 1L)                    // ≥ 1 island
    }
  }

  test("q78 PPS sample: strides distribute exactly, heavy orders guaranteed, deterministic") {
    val rows = CoreQueries.q78PpsSample(spark, Sf0001).collect()
    val o = Tables.orders(spark, Sf0001)
      .select(col("o_orderkey"), expr("cast(round(o_totalprice * 100) as long)").as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = o.map(_._2).sum
    // the k strides distribute EXACTLY over the selected units (a unit
    // wider than W/k absorbs several), so Σ per-unit crossings = k and
    // the distinct sample size is ≤ k
    val crossings = rows.map { r =>
      val (w, cum) = (r.getLong(1), r.getLong(2))
      cum * 1000L / total - (cum - w) * 1000L / total
    }.sum
    assert(crossings === 1000L)
    assert(rows.length <= 1000 && rows.length > 500)
    // systematic PPS guarantee: any unit with w·k ≥ W is ALWAYS selected
    val guaranteed = o.filter { case (_, w) => w * 1000L >= total }.map(_._1).toSet
    val sampled = rows.map(_.getLong(0)).toSet
    assert(guaranteed.subsetOf(sampled))
    // deterministic: a second run returns the identical sample
    val again = CoreQueries.q78PpsSample(spark, Sf0001).collect().map(_.getLong(0)).toSet
    assert(sampled === again)
  }

  test("q79 audit: clean corpus all-zero; planted violations are counted") {
    val clean = CoreQueries.q79ConstraintAudit(spark, Sf0001).collect()
    assert(clean.length === 6)
    assert(clean.forall(_.getLong(1) === 0L), "clean corpus must report zero violations")

    import spark.implicits._
    // plant: an orphan order (custkey 999), a duplicate orderkey, a
    // non-positive price, an orphan lineitem, an out-of-range quantity,
    // and a null shipdate
    val o = Seq((1L, 10L, 100.0), (2L, 999L, 50.0), (2L, 10L, -5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val li = Seq((1L, 10.0, "1995-01-01"), (77L, 10.0, "1995-01-01"),
        (1L, 99.0, "1995-01-01"), (1L, 10.0, null))
      .toDF("l_orderkey", "l_quantity", "l_shipdate")
    val c = Seq(Tuple1(10L)).toDF("c_custkey")
    val got = CoreQueries.constraintAudit(o, li, c).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "lineitem_orderkey_fk" -> 1L, "lineitem_qty_range" -> 1L,
      "lineitem_shipdate_null" -> 1L, "orders_custkey_fk" -> 1L,
      "orders_key_unique" -> 1L, "orders_price_positive" -> 1L))
  }

  test("q80 longest streak equals a driver-side replay (sf0.001)") {
    val dayNs = 86400000000000L
    val byUser = Tables.events(spark, Sf0001)
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2).distinct.sorted }
    val expected = byUser.map { case (u, days) =>
      val runs = days.foldLeft(List.empty[Long]) {
        case (len :: rest, d) if days.contains(d - 1) => (len + 1) :: rest
        case (acc, _) => 1L :: acc
      }
      u -> ((runs.max, days.size.toLong))
    }
    val got = CoreQueries.q80LongestStreak(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    got.values.foreach { case (longest, active) =>
      assert(longest >= 1L && longest <= active)
    }
  }

  test("q77 merges touching intervals into one island") {
    // hand-check the island rule on a 3-event fixture via the same
    // window plan shape: t=0, t=10min (touching → merge), t=30min (gap)
    import spark.implicits._
    val tenMin = 600000000000L
    val ev = Seq((1L, 0L), (1L, tenMin), (1L, 3 * tenMin))
      .toDF("user_id", "ts").withColumn("event_id", col("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val out = ev.withColumn("end_ns", col("ts") + lit(tenMin))
      .withColumn("pm", max(col("end_ns")).over(w))
      .withColumn("ni", when(col("pm").isNull || col("ts") > col("pm"), 1L).otherwise(0L))
      .agg(sum(col("ni"))).head().getLong(0)
    assert(out === 2L) // [0,20min) merged, [30,40min) separate
  }
}
