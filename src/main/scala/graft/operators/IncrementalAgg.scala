package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — refresh a materialized
  * per-key aggregate from a new delta partition WITHOUT rescanning
  * the base fact data.
  *
  * The trick is the standard partial-aggregation algebra Spark itself
  * uses inside one query, lifted to table granularity: persist the
  * aggregate in PARTIAL-STATE form (count + exact DECIMAL sums per
  * key), compute the same state for the delta alone, and merge states
  * by re-aggregating their union on the key. count/sum/min/max merge
  * losslessly; avg and other ratios are derived only at read time
  * ([[finalizeState]]). At 100 TB this is the difference between
  * touching yesterday's 100 TB again and touching today's 100 GB
  * delta: the merge's shuffle is O(|keys|), not O(|fact rows|).
  *
  * DECIMAL(18,6) accumulation makes the state exact and
  * merge-order-independent, so refresh(base ⊎ delta) is bit-identical
  * to a full recompute — q40's oracle asserts exactly that equality.
  */
object IncrementalAgg {

  /** Partial state: one row per key with `_cnt` and `_sum_<name>`
    * columns. This is the layout to persist (e.g. via
    * sources.BucketedTables keyed on `keys` so merges co-locate). */
  def partialState(df: DataFrame, keys: Seq[String],
      measures: Map[String, Column]): DataFrame = {
    val aggs = count(lit(1)).as("_cnt") +:
      measures.toSeq.sortBy(_._1).map { case (n, c) =>
        sum(c.cast(DecimalType(18, 6))).as(s"_sum_$n")
      }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of partial states (base + one or more deltas):
    * counts and exact sums add per key. Keys absent from one side pass
    * through untouched — a delta never forces a rewrite of unrelated
    * keys. */
  def merge(keys: Seq[String], measureNames: Seq[String],
      states: DataFrame*): DataFrame = {
    val aggs = sum(col("_cnt")).as("_cnt") +:
      measureNames.sorted.map(n => sum(col(s"_sum_$n")).as(s"_sum_$n"))
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read-time view: derive the user-facing aggregate (count, double
    * sums, averages) from the partial state. */
  def finalizeState(state: DataFrame, keys: Seq[String],
      measureNames: Seq[String]): DataFrame = {
    val derived = col("_cnt").as("n_rows") +:
      measureNames.sorted.flatMap { n =>
        // divide DOUBLES, not decimals: decimal-division scale rules
        // differ across engines, double division does not
        Seq(col(s"_sum_$n").cast("double").as(s"sum_$n"),
          (col(s"_sum_$n").cast("double") / col("_cnt")).as(s"avg_$n"))
      }
    state.select(keys.map(col) ++ derived: _*)
  }
}
