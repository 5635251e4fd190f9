package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted-join equivalence on a deliberately skewed fixture. */
class SkewJoinSpec extends SparkTestBase {

  test("salted equi-join equals the plain join on a 90%-hot-key fixture") {
    import spark.implicits._
    // 10k fact rows, 9k of them on key 7 (the hot key)
    val facts = (1 to 10000).map { i =>
      val k = if (i <= 9000) 7L else (i % 50).toLong
      (i.toLong, k, s"payload$i")
    }.toDF("row_id", "key", "payload")
    val dim = (0L until 50L).map(k => (k, s"dim$k")).toDF("key", "dim_val")

    val plain = facts.join(dim, "key")
      .select("row_id", "key", "payload", "dim_val")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedEquiJoin(facts, dim, "key", salt = 8)
      .select("row_id", "key", "payload", "dim_val")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 10000)
  }

  test("salt spreads the hot key across buckets") {
    import spark.implicits._
    val facts = (1 to 5000).map(i => (i.toLong, 7L)).toDF("row_id", "key")
    val salts = facts
      .withColumn("__salt", pmod(xxhash64(facts.columns.map(col).toIndexedSeq: _*), lit(8)))
      .groupBy("__salt").count().collect().map(r => r.getLong(1))
    assert(salts.length === 8) // every bucket hit
    assert(salts.max < 5000L * 0.3) // no bucket holds the whole key
  }
}
