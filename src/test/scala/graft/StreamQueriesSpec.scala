package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.StreamQueries

/** §2.F registry rows: the streaming-engine pass must compute exactly
  * what the equivalent batch plan computes (the invariant an
  * incremental pipeline is trusted for), and entries must be
  * re-invocable within one session (memory-sink query names are
  * session-unique). The DuckDB oracle gates cross-engine values;
  * these tests gate the streaming-vs-batch identity inside Spark. */
class StreamQueriesSpec extends SparkTestBase {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("double").cast(DecimalType(18, 6))).cast("double")

  test("st1 streaming windowed counts ≡ the same aggregation run as one batch") {
    val streamed = StreamQueries.st1(spark, Sf0001).collect().toSeq
    val batch = Tables.events(spark, Sf0001)
      .select(window(timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"),
        "1 hour").as("w"), col("event_type"), col("value"))
      .groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect().toSeq
    assert(streamed === batch)
  }

  test("st3 streaming bitmap distinct ≡ batch exact countDistinct") {
    val streamed = StreamQueries.st3(spark, Sf0001)
      .select(col("day"), col("event_type"), col("n_users")).collect().toSeq
    val batch = Tables.events(spark, Sf0001)
      .select(date_trunc("day",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        .cast("timestamp_ntz").as("day"),
        col("event_type"), col("user_id"))
      .groupBy(col("day"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"), col("event_type"))
      .collect().toSeq
    assert(streamed === batch)
  }

  test("streaming entries are re-invocable in one session (unique sink names)") {
    val a = StreamQueries.st2(spark, Sf0001).count()
    val b = StreamQueries.st2(spark, Sf0001).count()
    assert(a === b && a > 0)
  }

  test("st4 = st1 minus the windows the 2-hour watermark holds open") {
    val all = StreamQueries.st1(spark, Sf0001).collect().toSeq
    val closed = StreamQueries.st4(spark, Sf0001).collect().toSeq
    val maxTs = Tables.events(spark, Sf0001)
      .agg(max(timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")))
      .head().getAs[java.time.LocalDateTime](0)
    val cutoff = maxTs.minusHours(2)
    val expected = all.filter(
      _.getAs[java.time.LocalDateTime]("window_start").plusHours(1).compareTo(cutoff) <= 0)
    assert(closed === expected)
    assert(closed.size < all.size, "watermark suppressed nothing — open windows leaked")
  }
}
