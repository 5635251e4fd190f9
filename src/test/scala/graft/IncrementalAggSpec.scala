package graft

import org.apache.spark.sql.functions.{col, year}

import graft.operators.IncrementalAgg

/** Incremental aggregate maintenance: refresh ≡ full recompute, merge
  * is split-invariant, and a delta only touches its own keys. */
class IncrementalAggSpec extends SparkTestBase {

  private val keys = Seq("o_custkey")
  private val names = Seq("price")
  private def ms = Map("price" -> col("o_totalprice"))

  private def full() = {
    val o = Tables.orders(spark, Sf0001)
    IncrementalAgg.finalizeState(
      IncrementalAgg.partialState(o, keys, ms), keys, names)
  }

  test("base+delta refresh is bit-identical to the full recompute") {
    val o = Tables.orders(spark, Sf0001)
    val base = IncrementalAgg.partialState(
      o.filter(year(col("o_orderdate")) < 1997), keys, ms)
    val delta = IncrementalAgg.partialState(
      o.filter(year(col("o_orderdate")) >= 1997), keys, ms)
    val merged = IncrementalAgg.finalizeState(
      IncrementalAgg.merge(keys, names, base, delta), keys, names)
    assert(merged.orderBy("o_custkey").collect().map(_.toSeq).toSeq ===
      full().orderBy("o_custkey").collect().map(_.toSeq).toSeq)
  }

  test("merge is split-invariant: three deltas give the same state") {
    val o = Tables.orders(spark, Sf0001)
    val parts = Seq(
      o.filter(col("o_custkey") % 3 === 0),
      o.filter(col("o_custkey") % 3 === 1),
      o.filter(col("o_custkey") % 3 === 2),
    ).map(IncrementalAgg.partialState(_, keys, ms))
    val merged = IncrementalAgg.finalizeState(
      IncrementalAgg.merge(keys, names, parts: _*), keys, names)
    assert(merged.orderBy("o_custkey").collect().map(_.toSeq).toSeq ===
      full().orderBy("o_custkey").collect().map(_.toSeq).toSeq)
  }

  test("a delta leaves unrelated keys' state untouched") {
    val o = Tables.orders(spark, Sf0001)
    val base = IncrementalAgg.partialState(o, keys, ms)
    val touched = o.filter(col("o_custkey") < 10)
    val refreshed = IncrementalAgg.merge(keys, names,
      base, IncrementalAgg.partialState(touched, keys, ms))
    val unchanged = refreshed.filter(col("o_custkey") >= 10)
      .orderBy("o_custkey").collect().map(_.toSeq).toSeq
    val orig = base.filter(col("o_custkey") >= 10)
      .orderBy("o_custkey").collect().map(_.toSeq).toSeq
    assert(unchanged === orig)
  }
}
