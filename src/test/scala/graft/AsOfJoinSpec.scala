package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {

  test("asof picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (1L, 25L, 101L), (1L, 40L, 102L),
      (2L, 15L, 200L), // user with no preceding right row
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 99L, "z"), // after the only left row → never matched
    ).toDF("k", "t", "p")
    val out = AsOfJoin.asof(left, right, "k", "t", "t", Seq("p"))
      .collect().map(r => (r.getLong(2), Option(r.getString(3)))).toMap
    assert(out(100L) === Some("a")) // inclusive: right at t=10 matches left t=10
    assert(out(101L) === Some("b")) // 20 ≤ 25 < 30
    assert(out(102L) === Some("c"))
    assert(out(200L) === None)      // nothing at or before 15
  }

  test("q22 as-of results are consistent with a per-row recomputation") {
    val rows = graft.queries.CoreQueries.q22AsofJoin(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // recompute: latest purchase ts ≤ click ts per user
    val purchases = ev.filter(_._4 == "purchase").groupBy(_._3)
    val clicks = ev.filter(_._4 == "click").map(e => e._1 -> e).toMap
    rows.foreach { r =>
      val (eid, uid) = (r.getLong(0), r.getLong(1))
      val clickTs = clicks(eid)._2
      val want = purchases.getOrElse(uid, Array.empty).filter(_._2 <= clickTs)
        .sortBy(p => (p._2, p._1)).lastOption.map(_._1)
      val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(got === want, s"event $eid user $uid")
    }
  }
}
