package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins.
  *
  * When one join key holds a disproportionate share of the fact rows
  * (the null-ish key, the default tenant, the viral document), a plain
  * shuffle join sends that key's entire volume to ONE reducer. AQE's
  * skew-join splitter repairs sort-merge joins at runtime, but salting
  * is the planning-time tool when (a) AQE is off (streaming, some
  * managed runtimes), (b) the skewed side must stay hash-partitioned
  * for a downstream stage, or (c) the hot key is so large a single
  * split still spills.
  *
  * Mechanics: the big side gets a deterministic salt in [0, salt)
  * hashed from the full row (same-key rows scatter across salt
  * buckets); the small side is replicated salt× via one explode —
  * joining on (key, salt) splits the hot key's reducer into `salt`
  * reducers. Output = exactly the unsalted join (spec-asserted);
  * replication cost = |small| × salt rows, the standard trade.
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `key`, with the hot-key volume spread
    * over `salt` reducers. All columns of both sides survive. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val saltCol: Column =
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salt))
    val b = big.withColumn("__salt", saltCol)
    val s2 = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${salt - 1})")))
    b.join(s2, Seq(key, "__salt")).drop("__salt")
  }
}
