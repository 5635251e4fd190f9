package graft

import graft.queries.CoreQueries

/** q74 triangle counting: the distributed wedge-join answer must equal
  * a driver-side brute force over the same co-purchase edge set, and
  * the degree orientation must tame a power-law hub (the skew shape
  * that blows up an id-oriented wedge join at scale). */
class TrianglesSpec extends SparkTestBase {

  test("q74 per-part counts equal a brute-force recomputation (sf0.001)") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("a").join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("lo"), col("b.l_partkey").as("hi"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))

    val edgeSet = edges.toSet
    val nbrs = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- edges; c <- nbrs(b) if b < c && edgeSet((a, c))) {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }

    val got = CoreQueries.q74Triangles(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === counts.toMap)
    // sanity on the shape: total participation is divisible by 3
    assert(got.values.sum % 3 === 0)
  }

  test("co-purchase cap: capped build ≡ uncapped on the driver corpus; a mega-order truncates to cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // TPC-H orders hold ≤ 7 parts, far under the 64-part cap, so the
    // guarded build must be IDENTICAL to the unguarded one
    val li = Tables.lineitem(spark, Sf0001)
    def edges(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(edges(CoreQueries.copurchaseEdgesFrom(li, 64)) ===
      edges(CoreQueries.copurchaseEdgesFrom(li, Int.MaxValue)))
    // a planted 200-item wholesale order truncates deterministically to
    // its 10 LOWEST partkeys → exactly C(10,2) pairs, not C(200,2)
    val mega = (1L to 200L).map(p => (9999L, p)).toDF("l_orderkey", "l_partkey")
    val capped = edges(CoreQueries.copurchaseEdgesFrom(mega, 10))
    assert(capped.length === 45)
    assert(capped.forall { case (u, v, c) => u <= 10L && v <= 10L && c == 1L })
  }

  test("materialized orientation: q74's oriented probe ≡ inline orient + count (sf0.001)") {
    import org.apache.spark.sql.functions._
    val edges = CoreQueries.copurchaseEdges(spark, Sf0001).select(col("u"), col("v"))
    val inline = graft.operators.Triangles.perNodeCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = graft.operators.Triangles
      .perNodeCountsOriented(CoreQueries.copurchaseOriented(spark, Sf0001))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probed === inline)
    assert(probed.nonEmpty)
    // the stored orientation satisfies the (deg, id) invariant: every
    // lo appears with out-degree ≤ its total degree and each edge once
    val o = CoreQueries.copurchaseOriented(spark, Sf0001)
    assert(o.count() === edges.count())
  }

  test("skewed hub: counts exact AND degree orientation caps the hub's out-degree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // node 0 is a hub co-occurring with 1..300 (out-degree 300 under id
    // orientation — the wedge-explosion shape); a sparse ring among the
    // spokes (i — i+1) creates hub-spoke-spoke triangles
    val hub = (1L to 300L).map(v => (0L, v))
    val ring = (1L to 299L).map(i => (i, i + 1))
    val edges = (hub ++ ring).toDF("u", "v")

    val edgeSeq = (hub ++ ring)
    val edgeSet = edgeSeq.toSet
    val nbrs = edgeSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- edgeSeq; c <- nbrs(b) if b < c && edgeSet((a, c))) {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }

    val got = graft.operators.Triangles.perNodeCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === counts.toMap)
    // hub participates in every ring triangle (0, i, i+1)
    assert(got(0L) === 299L)

    // the orientation invariant itself: the hub (deg 300 — the max)
    // ranks above every spoke (deg ≤ 3), so ALL its edges point IN and
    // its oriented out-degree is 0 — id orientation would give it 300
    // out-edges and a ~300²-wedge hot spot
    val hubOut = graft.operators.Triangles.orient(edges)
      .filter(col("lo") === 0L).count()
    assert(hubOut === 0L)
  }

  test("co-purchase edge index probe ≡ the inline self-join it amortizes") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_partkey"))
    val inline = li.as("a").join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey"))
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_orderkey"), col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val probe = CoreQueries.copurchaseEdges(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(probe === inline)
    assert(probe.nonEmpty)
  }
}
