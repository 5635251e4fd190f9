package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the right row with the greatest
  * `rightTime` ≤ `leftTime` within the same key group (the classic
  * point-in-time lookup Spark has no native operator for).
  *
  * Implementation is union + ordered window, NOT a range-condition
  * join: Spark executes `l.key = r.key AND r.t <= l.t` as a join with
  * a non-equi residual whose per-key worst case is |L|×|R|; the union
  * instead shuffles both inputs ONCE on the key, sorts each group by
  * (time, side) with right rows winning ties, and carries the latest
  * right payload forward with `last(_, ignoreNulls = true)`. Linear
  * work and one exchange regardless of how many right rows precede
  * each left row — the property that survives 100 TB.
  *
  * Right rows must be unique per (key, time) for a deterministic
  * result — pre-aggregate the right side to enforce it.
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val lPadded = payload.foldLeft(l)((df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType)))
    val r0 = right.select((key +: rightTime +: payload).map(col): _*)
      .withColumnRenamed(rightTime, "__t")
      .withColumn("__side", lit(0))
    val rPadded = leftCols.filterNot(c => c == key).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lPadded.unionByName(rPadded.select(lPadded.columns.map(col): _*))
    // right (side 0) sorts before left (side 1) at equal times → the
    // inclusive (≤) as-of semantics
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(s"asof_$p", last(col(p), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"asof_$p"))): _*)
  }
}
