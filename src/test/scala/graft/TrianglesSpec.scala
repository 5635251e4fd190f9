package graft

import graft.queries.CoreQueries

/** q74 triangle counting: the distributed wedge-join answer must equal
  * a driver-side brute force over the same co-purchase edge set. */
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
}
