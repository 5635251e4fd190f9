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

  test("st5 stream-stream join ≡ the same interval join run as one batch") {
    val streamed = StreamQueries.st5(spark, Sf0001).collect().toSeq
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        expr("(ts div 1000) * 1000").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        expr("(ts div 1000) * 1000").as("p_ts"), col("value"))
    val batch = clicks.join(purchases,
        col("c_user") === col("p_user") && col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + lit(3600L * 1000000000L))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        timestamp_micros(expr("c_ts div 1000")).cast("timestamp_ntz").as("click_ts"),
        timestamp_micros(expr("p_ts div 1000")).cast("timestamp_ntz").as("purchase_ts"),
        col("value"))
      .orderBy(col("click_id"), col("purchase_id"))
      .collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("st6 = strict-gap batch sessions minus those the watermark holds open") {
    import org.apache.spark.sql.expressions.Window
    val streamed = StreamQueries.st6(spark, Sf0001).collect().toSeq
    // batch twin of session_window's STRICT gap rule: an event exactly
    // gap after its predecessor starts a NEW session
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapNs = 1800L * 1000000000L
    // session_window computes on µs-truncated event time — the gap
    // rule must compare at the same granularity (the oracle's
    // make_timestamp(epoch_us) fix, applied to the batch twin)
    val sessions = Tables.events(spark, Sf0001)
      .withColumn("ts", expr("(ts div 1000) * 1000"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s", when(col("prev_ts").isNull ||
        col("ts") - col("prev_ts") >= lit(gapNs), 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        timestamp_micros(expr("min_ts div 1000")).cast("timestamp_ntz").as("start_ts"),
        (timestamp_micros(expr("max_ts div 1000")) + expr("interval 30 minutes"))
          .cast("timestamp_ntz").as("end_ts"),
        col("n_events"), col("total_value"))
    val maxTs = Tables.events(spark, Sf0001)
      .agg(max(timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")))
      .head().getAs[java.time.LocalDateTime](0)
    val cutoff = maxTs.truncatedTo(java.time.temporal.ChronoUnit.MILLIS).minusHours(2)
    val all = sessions.orderBy(col("user_id"), col("start_ts")).collect().toSeq
    val expected = all.filter(
      _.getAs[java.time.LocalDateTime]("end_ts").compareTo(cutoff) <= 0)
    assert(streamed === expected)
    assert(streamed.size < all.size, "watermark suppressed nothing — open sessions leaked")
  }

  test("st7 streaming dedup-within-watermark ≡ batch exact DISTINCT") {
    val streamed = StreamQueries.st7(spark, Sf0001).collect().toSeq
    val batch = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", timestamp_micros(expr("ts div 1000")))
          .cast("timestamp_ntz").as("hour"))
      .distinct()
      .orderBy(col("user_id"), col("event_type"), col("hour"))
      .collect().toSeq
    assert(streamed === batch)
    // the dedup actually dropped rows (events per key-hour > 1 somewhere)
    assert(streamed.size < Tables.events(spark, Sf0001).count())
  }

  test("st8 custom-state totals ≡ batch groupBy (exact integer arithmetic)") {
    val streamed = StreamQueries.st8(spark, Sf0001).collect().toSeq
    val batch = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("ts"),
        expr("cast(round(value * 1000000) as long)").as("v"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("total_micros"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .orderBy(col("user_id"))
      .collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("st9 left-outer join = matches ∪ unmatched clicks past the two-sided watermark") {
    val streamed = StreamQueries.st9(spark, Sf0001).collect().toSeq
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), expr("(ts div 1000) * 1000").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), expr("(ts div 1000) * 1000").as("p_ts"), col("value"))
    val joined = clicks.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + lit(3600L * 1000000000L), "left_outer")
      .groupBy(col("user_id"), col("click_id"), col("c_ts"))
      .agg(count(col("p_ts")).as("n_purchases"),
        dsum(coalesce(col("value"), lit(0.0))).as("total_value"))
    // watermark base = min of the two sides' ms-truncated max event
    // times (each side watermarks its FILTERED stream; the engine
    // takes the min across watermark operators); an unmatched click
    // survives only once base − 2 h passes click_ts + 1 h
    val maxOf = (t: String) => ev.filter(col("event_type") === t)
      .agg(max(expr("(ts div 1000000) * 1000000"))).head().getLong(0)
    val base = math.min(maxOf("click"), maxOf("purchase"))
    val cutoff = base - 3L * 3600L * 1000000000L
    val expected = joined
      .filter(col("n_purchases") > 0 || col("c_ts") < lit(cutoff))
      .select(col("user_id"), col("click_id"),
        timestamp_micros(expr("c_ts div 1000")).cast("timestamp_ntz").as("click_ts"),
        col("n_purchases"), col("total_value"))
      .orderBy(col("click_id"))
      .collect().toSeq
    assert(streamed === expected)
    val all = joined.count()
    assert(streamed.size < all, "watermark suppressed nothing — young unmatched clicks leaked")
  }

  test("st10 full outer: click side ≡ st9's entity set; purchase side evicts at its own tighter bound") {
    val rows = StreamQueries.st10(spark, Sf0001).collect().toSeq
    val (clickRows, purchRows) = rows.partition(_.getString(0) == "click")
    // click side carries exactly st9's entity set (same eviction rule)
    val st9ids = StreamQueries.st9(spark, Sf0001).collect().map(_.getLong(1)).toSet
    assert(clickRows.map(_.getLong(2)).toSet === st9ids)
    // purchase side: batch twin — matched purchases always, unmatched
    // ones once purchase_ts < watermark base − 2 h
    val ev = Tables.events(spark, Sf0001)
    val maxOf = (t: String) => ev.filter(col("event_type") === t)
      .agg(max(expr("(ts div 1000000) * 1000000"))).head().getLong(0)
    val base = math.min(maxOf("click"), maxOf("purchase"))
    val cutoff = base - 2L * 3600L * 1000000000L
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("pid"), expr("(ts div 1000) * 1000").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), expr("(ts div 1000) * 1000").as("c_ts"))
    val expected = purchases.join(clicks,
        col("p_user") === col("c_user") && col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + lit(3600L * 1000000000L), "left_outer")
      .groupBy(col("pid"), col("p_ts"))
      .agg(count(col("c_ts")).as("n"))
      .filter(col("n") > 0 || col("p_ts") < lit(cutoff))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(purchRows.map(r => r.getLong(2) -> r.getLong(4)).toMap === expected)
    assert(clickRows.nonEmpty && purchRows.nonEmpty)
  }

  test("st11 chained rollup = batch day-grain totals minus the days the watermark holds open") {
    val streamed = StreamQueries.st11(spark, Sf0001).collect().toSeq
    val maxTs = Tables.events(spark, Sf0001)
      .agg(max(timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")))
      .head().getAs[java.time.LocalDateTime](0)
    val cutoff = maxTs.truncatedTo(java.time.temporal.ChronoUnit.MILLIS).minusHours(2)
    val batch = Tables.events(spark, Sf0001)
      .select(date_trunc("hour",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")).as("hw"),
        col("event_type"), col("value"))
      .groupBy(col("hw"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("double").cast(DecimalType(18, 6))).as("hv"))
      .groupBy(date_trunc("day", col("hw")).cast("timestamp_ntz").as("day_start"),
        col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_hours"),
        sum(col("hv")).cast("double").as("total_value"))
      .orderBy(col("day_start"), col("event_type"))
      .collect().toSeq
    val expected = batch.filter(
      _.getAs[java.time.LocalDateTime]("day_start").plusDays(1).compareTo(cutoff) <= 0)
    assert(streamed === expected)
    assert(streamed.nonEmpty && streamed.size < batch.size,
      "watermark suppressed nothing — the open tail day leaked")
  }

  test("st12 streaming top-k = batch per-day rank over watermark-closed days") {
    val streamed = StreamQueries.st12(spark, Sf0001).collect().toSeq
    val maxTs = Tables.events(spark, Sf0001)
      .agg(max(timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")))
      .head().getAs[java.time.LocalDateTime](0)
    val cutoff = maxTs.truncatedTo(java.time.temporal.ChronoUnit.MILLIS).minusHours(2)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("day"))
      .orderBy(col("total_value").desc, col("user_id"))
    val batch = Tables.events(spark, Sf0001)
      .select(date_trunc("day",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        .cast("timestamp_ntz").as("day"),
        col("user_id"), col("value"))
      .groupBy(col("day"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("day"), col("rnk"), col("user_id"), col("n_events"), col("total_value"))
      .orderBy(col("day"), col("rnk"))
      .collect().toSeq
    val expected = batch.filter(
      _.getAs[java.time.LocalDateTime]("day").plusDays(1).compareTo(cutoff) <= 0)
    assert(streamed === expected)
    assert(streamed.nonEmpty && streamed.size < batch.size,
      "watermark suppressed nothing — the open tail day leaked")
  }

  test("st9/st10 eviction boundary: an entity exactly ON its bound is suppressed, 1 ms inside emits") {
    // The oracles encode the null-row eviction rules with STRICT '<'
    // against the ms-truncated watermark base (click: click_ts + 3 h <
    // base; purchase: purchase_ts + 2 h < base). SURVEY admits the
    // strictness was pinned empirically on driver datasets — this
    // fixture plants one unmatched entity EXACTLY on each bound and one
    // 1 ms inside it, pinning the strictness against the engine itself:
    // a dataset whose max lands precisely on an entity's horizon can
    // never flip the hash gate.
    import spark.implicits._
    val H = 3600000000L // µs per hour
    val B = 1577836800000000L // 2020-01-01 00:00:00 UTC, ms-aligned µs
    val rows = Seq(
      // (event_id, µs, user_id, type, value) — base = min side max = B+3H
      (1L, B, 1L, "click", 0.0),               // exactly on click bound (B+3H ≮ base) → suppressed
      (2L, B - 1000L, 2L, "click", 0.0),       // 1 ms inside → emitted unmatched
      (3L, B + 4 * H, 3L, "click", 0.0),       // young unmatched (sets click max) → suppressed
      (4L, B + 3 * H, 4L, "purchase", 1.0),    // sets purchase max; young unmatched purchase
      (5L, B + H, 5L, "click", 0.0),           // matched click
      (6L, B + H + 1800000000L, 5L, "purchase", 2.5), // its match, 30 min later
      (7L, B + H, 6L, "purchase", 1.0),        // exactly on purchase bound (base − 2H) → suppressed
      (8L, B + H - 1000L, 7L, "purchase", 1.0)) // 1 ms inside → emitted unmatched
    val dir = java.nio.file.Files.createTempDirectory("graft-stboundary").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val st9 = StreamQueries.st9(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getDouble(4))).toSeq
    assert(st9 === Seq((2L, 0L, 0.0), (5L, 1L, 2.5)))
    val st10 = StreamQueries.st10(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSeq
    assert(st10 === Seq(("click", 2L, 0L), ("click", 5L, 1L),
      ("purchase", 6L, 1L), ("purchase", 8L, 0L)))
  }

  test("st3/st5/st6/st8/st9/st10/st11/st12/st14/st16 under RocksDBStateStoreProvider ≡ default-provider outputs") {
    // The 100 TB deployment config keeps streaming state in RocksDB
    // (state outgrows the heap); this pins that every hard state shape
    // — the custom graft_bitmap TypedImperativeAggregate (st3),
    // stream-stream join buffers (st5), session_window merge state
    // (st6), flatMapGroupsWithState tuple state (st8), OUTER-join
    // eviction state whose null rows emit exactly when a buffered row
    // is evicted (st9/st10 — round 8: the serialization shape most
    // likely to diverge, since correctness rides the store's eviction
    // scan, not just lookups), the chained two-store rollup (st11)
    // and append-mode day×user cells (st12), plus st14's day×type
    // DECIMAL mart feeding the batch-shared z-score chain and st16's
    // join→agg two-store chain (both stateful stores in ONE pipeline,
    // closure on the min-of-inputs global watermark) — serializes
    // through the RocksDB provider with output identical to the
    // default HDFS-backed store. st13 is deliberately absent: its
    // state lives in its own versioned parquet tables (foreachBatch,
    // no streaming state store), so the provider is vacuous there.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    val names = Seq("st3", "st5", "st6", "st8", "st9", "st10", "st11", "st12", "st14", "st16")
    def runAll(): Seq[Seq[org.apache.spark.sql.Row]] = Seq(
      StreamQueries.st3(spark, Sf0001).collect().toSeq,
      StreamQueries.st5(spark, Sf0001).collect().toSeq,
      StreamQueries.st6(spark, Sf0001).collect().toSeq,
      StreamQueries.st8(spark, Sf0001).collect().toSeq,
      StreamQueries.st9(spark, Sf0001).collect().toSeq,
      StreamQueries.st10(spark, Sf0001).collect().toSeq,
      StreamQueries.st11(spark, Sf0001).collect().toSeq,
      StreamQueries.st12(spark, Sf0001).collect().toSeq,
      StreamQueries.st14(spark, Sf0001).collect().toSeq,
      StreamQueries.st16(spark, Sf0001).collect().toSeq)
    val base = runAll()
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = runAll()
      base.zip(rocks).zipWithIndex.foreach { case ((b, r), i) =>
        assert(r === b, s"query ${names(i)} diverges under RocksDB")
      }
      assert(base.forall(_.nonEmpty))
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("st11/st12 through a REAL parquet file sink under RocksDB ≡ memory-sink registry outputs") {
    // VERDICT r7 #3: st12's x30 scale sample was blamed on the memory
    // sink holding the O(users×days) mart in driver memory — "the
    // production shape writes that mart to a real sink" must be
    // evidence, not argument. This runs the same streaming aggregates
    // through a durable parquet sink (commit-log scoped read-back)
    // with RocksDB state, and pins output identity with the
    // memory-sink registry entries; ScaleBench's st11_file_sink /
    // st12_file_sink extras run this exact path for the x1→x30 curve.
    val mem11 = StreamQueries.st11(spark, Sf0001).collect().toSeq
    val mem12 = StreamQueries.st12(spark, Sf0001).collect().toSeq
    assert(StreamQueries.st11FileSink(spark, Sf0001).collect().toSeq === mem11)
    assert(StreamQueries.st12FileSink(spark, Sf0001).collect().toSeq === mem12)
    assert(mem11.nonEmpty && mem12.nonEmpty)
  }

  test("st14 = q82's z-scores restricted to watermark-closed days") {
    // the z-window is backward-looking, so restricting the day set to
    // the closed prefix changes NO retained score — st14 must equal
    // batch q82 row-for-row on the days the watermark has closed
    val streamed = StreamQueries.st14(spark, Sf0001).collect().toSeq
    val maxNs = Tables.events(spark, Sf0001).agg(max(col("ts"))).head().getLong(0)
    val cutUs = (maxNs / 1000000L) * 1000L - 2L * 3600L * 1000000L // ms-trunc, −2 h, in µs
    val dayUs = 86400000000L
    val batchAll = graft.queries.CoreQueries.q82RollingZscore(spark, Sf0001).collect().toSeq
    val batchClosed = batchAll.filter(r => (r.getLong(1) + 1) * dayUs <= cutUs)
    assert(streamed === batchClosed)
    assert(streamed.nonEmpty)
    assert(streamed.size < batchAll.size, "watermark suppressed nothing — fixture degenerate")
  }

  test("st13 merge-upsert: multi-batch run (4-file source, 1 file/trigger) ≡ single run ≡ batch twin") {
    // exactly-once is only interesting ACROSS batch boundaries: the
    // single-parquet-file registry source yields one data batch, so
    // this splits events into 4 files and rate-limits the stream to 1
    // file per trigger — the standing view must fold through ≥4
    // versioned merges and still land on the plain-rank answer, which
    // is the associativity/idempotence claim of the versioned-state
    // design (state_N deterministically recomputed from state_(N−1)).
    val dir = java.nio.file.Files.createTempDirectory("graft-st13-src").toString
    spark.read.parquet(s"$Sf0001/events.parquet").repartition(4)
      .write.parquet(s"$dir/events.parquet")
    val (standing, versions) = StreamQueries.mergeUpsertRunWithCount(spark,
      StreamQueries.eventsStreamFrom(spark, dir, Some(1)))
    val multi = StreamQueries.st13Finish(standing).collect().toSeq
    assert(versions >= 4, s"expected >=4 state versions, got $versions")
    val single = StreamQueries.st13(spark, Sf0001).collect().toSeq
    assert(multi === single)
    val twin = StreamQueries.st13Finish(StreamQueries.latestPerUser(
      Tables.events(spark, Sf0001).select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("ets"),
        col("event_type"), col("value")))).collect().toSeq
    assert(multi === twin)
    assert(multi.nonEmpty)
  }

  test("st4 = st1 minus the windows the 2-hour watermark holds open") {
    val all = StreamQueries.st1(spark, Sf0001).collect().toSeq
    val closed = StreamQueries.st4(spark, Sf0001).collect().toSeq
    val maxTs = Tables.events(spark, Sf0001)
      .agg(max(timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")))
      .head().getAs[java.time.LocalDateTime](0)
    // ms truncation matches the engine: Spark advances the watermark
    // from millisecond-granularity event-time stats
    val cutoff = maxTs.truncatedTo(java.time.temporal.ChronoUnit.MILLIS).minusHours(2)
    val expected = all.filter(
      _.getAs[java.time.LocalDateTime]("window_start").plusHours(1).compareTo(cutoff) <= 0)
    assert(closed === expected)
    assert(closed.size < all.size, "watermark suppressed nothing — open windows leaked")
  }

  test("st15 ingest dedup: multi-batch (4-file, 1/trigger) ≡ single run ≡ dd9-pairs batch twin") {
    import graft.queries.PipelineQueries
    // Batch-split invariance: verdicts are per-doc facts against the
    // STANDING corpus only, so slicing the delta into micro-batches
    // must change nothing.
    val dir = java.nio.file.Files.createTempDirectory("graft-st15-src").toString
    spark.read.parquet(s"$Sf0001/documents.parquet").repartition(4)
      .write.parquet(s"$dir/documents.parquet")
    val multi = StreamQueries.st15From(spark, dir, Some(1)).collect().toSeq
    val single = StreamQueries.st15(spark, Sf0001).collect().toSeq
    assert(multi === single)
    // Batch twin: dd9's exact delta-vs-standing pair set folded by the
    // same verdict — the streaming path computes dd9's answer.
    val docs = Tables.documents(spark, Sf0001)
    val twin = StreamQueries.ingestVerdict(
      docs.filter(PipelineQueries.isDeltaDoc),
      graft.operators.Dedup.incrementalDedup(docs, 1,
        PipelineQueries.JaccardThreshold, PipelineQueries.isDeltaDoc))
      .orderBy(col("doc_id")).collect().toSeq
    assert(single === twin)
    // every delta doc verdicted exactly once
    val nDelta = docs.filter(PipelineQueries.isDeltaDoc).count()
    assert(single.size.toLong === nDelta)
    assert(single.map(_.getLong(0)).distinct.size.toLong === nDelta)
  }

  test("st17 ANN ingest: multi-batch (4-file, 1/trigger) ≡ single ≡ one-shot union build; replayed batch appends zero") {
    import graft.operators.Similarity
    import graft.queries.PipelineQueries
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // temp-hygiene baseline: only dirs created by THIS test count as
    // stranded (pre-round-12 sessions may have left strays on the host)
    def st17Dirs(): Set[String] = {
      val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
      Option(tmpRoot.listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("graft_st17")).map(_.getName).toSet
    }
    val preExisting = st17Dirs()
    // batch-split invariance: ivf assignment is a pure per-row function
    // of the frozen centroids, so HOW the stream slices the delta must
    // leave the ingested index's probe bit-identical
    val dir = java.nio.file.Files.createTempDirectory("graft-st17-src").toString
    spark.read.parquet(s"$Sf0001/embeddings.parquet").repartition(4)
      .write.parquet(s"$dir/embeddings.parquet")
    val multi = rows(StreamQueries.st17From(spark, dir, Some(1)))
    val single = rows(StreamQueries.st17(spark, Sf0001))
    assert(multi === single && single.nonEmpty)
    // ...and ≡ a one-shot batch append of the whole delta under the
    // same trained state (ivfAppendDelta's union-build contract)
    val emb = Tables.embeddings(spark, Sf0001)
    val base = PipelineQueries.cachedAnnIndex(spark, Sf0001, "ivf_base")
    val oneShot = java.nio.file.Files.createTempDirectory("graft-st17-one").toString
    Tables.copyDir(new java.io.File(base), new java.io.File(s"$oneShot/idx"))
    Similarity.ivfAppendDelta(emb.filter(col("vec_id") % 8 === 0), s"$oneShot/idx")
    val q = emb.filter(col("vec_id") < PipelineQueries.NQueries)
    assert(rows(Similarity.ivfProbeIndex(spark, s"$oneShot/idx", q,
      PipelineQueries.TopK)) === single)
    // exactly-once: replaying the SAME batch (and a subset of it)
    // against the idempotent append adds nothing — st13's idempotence
    // argument on an append-only layout
    val replay = java.nio.file.Files.createTempDirectory("graft-st17-rep").toString
    Tables.copyDir(new java.io.File(base), new java.io.File(s"$replay/idx"))
    val delta = emb.filter(col("vec_id") % 8 === 0)
    val n1 = Similarity.ivfAppendDeltaIdempotent(delta, s"$replay/idx")
    assert(n1 === delta.count())
    val probe1 = rows(Similarity.ivfProbeIndex(spark, s"$replay/idx", q,
      PipelineQueries.TopK))
    assert(Similarity.ivfAppendDeltaIdempotent(delta, s"$replay/idx") === 0L)
    assert(Similarity.ivfAppendDeltaIdempotent(
      delta.filter(col("vec_id") % 16 === 0), s"$replay/idx") === 0L)
    assert(rows(Similarity.ivfProbeIndex(spark, s"$replay/idx", q,
      PipelineQueries.TopK)) === probe1)
    assert(probe1 === single)
    // temp hygiene (round 12 — VERDICT r11 wrong-item #1): every
    // graft_st17 run dir (index copy + checkpoint) is deleted before
    // st17 returns — the invocations above must strand nothing new
    val stranded = st17Dirs() -- preExisting
    assert(stranded.isEmpty, s"st17 stranded run dirs: ${stranded.take(3)}")
  }

  test("st15 ingest dedup: index-standing verdicts ≡ checkpoint-standing twin (round 9)") {
    // VERDICT r8 #8: the registry st15 reads its standing side off the
    // persisted non-delta shingle index; the pre-round-9 shape pinned
    // re-tokenized sets in executor memory. The two representations
    // carry the same sets (the index arrays are df-SORTED, and every
    // step of the probe — vocabulary probe, mask encode, prefix
    // re-derivation, array_intersect verification — is order-
    // insensitive set algebra), so the verdicts must be identical.
    val viaIndex = StreamQueries.st15(spark, Sf0001).collect().toSeq
    val viaCheckpoint = StreamQueries.st15CheckpointFrom(spark, Sf0001, None)
      .collect().toSeq
    assert(viaIndex === viaCheckpoint)
    assert(viaIndex.nonEmpty)
  }

  test("st15 ingest dedup: planted fixture — exact copy, τ-boundary near-copy, unique doc, lowest-id tie") {
    import spark.implicits._
    // ids chosen by their md5 first hex digit: 27/59/60 are delta
    // ('0'), 1/2/3/4 are base. Doc 27 copies base 1 AND base 3 (equal
    // jaccard 1.0 -> dup_of must tie to the LOWEST base id, n_matches
    // 2); doc 60 adds one token to base 4's nine (jaccard exactly
    // 9/10 = τ — the boundary the floor-prefix argument must keep);
    // doc 59 is unique.
    val dir = java.nio.file.Files.createTempDirectory("graft-st15-fix").toString
    val fox = "the quick brown fox jumps over a lazy dog"
    val nine = "alpha beta gamma delta epsilon zeta eta theta iota"
    Seq(
      (1L, fox), (2L, "completely different text about spark engines"),
      (3L, fox), (4L, nine),
      (27L, fox), (59L, "unique delta content zebra xylophone"),
      (60L, nine + " kappa")
    ).toDF("doc_id", "text").repartition(1)
      .write.parquet(s"$dir/documents.parquet")
    val out = StreamQueries.st15(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3), r.getLong(4))).toSeq
    assert(out === Seq(
      (27L, true, 1L, 1.0, 2L),
      (59L, false, -1L, -1.0, 0L),
      (60L, true, 4L, 0.9, 1L)))
  }

  test("st18 cdc apply: multi-batch (4-file, 1/trigger) ≡ single run ≡ batch twin; tombstones suppress") {
    val dir = java.nio.file.Files.createTempDirectory("graft-st18-src").toString
    spark.read.parquet(s"$Sf0001/events.parquet").repartition(4)
      .write.parquet(s"$dir/events.parquet")
    val (standing, versions) = StreamQueries.cdcApplyRun(spark,
      StreamQueries.eventsStreamFrom(spark, dir, Some(1)))
    val multi = StreamQueries.st18Finish(standing).collect().toSeq
    assert(versions >= 4, s"expected >=4 state versions, got $versions")
    val single = StreamQueries.st18(spark, Sf0001).collect().toSeq
    assert(multi === single)
    val twin = StreamQueries.st18Finish(StreamQueries.cdcAggOps(
      Tables.events(spark, Sf0001).select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("ets"),
        col("event_type"), col("value")))).collect().toSeq
    assert(multi === twin)
    assert(multi.nonEmpty)
    val nUsers = Tables.events(spark, Sf0001).select("user_id").distinct().count()
    assert(multi.size < nUsers, "no tombstone suppressed a key — fixture degenerate")
  }

  test("st18 cdc semantics: planted delete / re-create / column-patch boundaries") {
    import spark.implicits._
    // (user, µs, op-bearing event_type, value) — the op mapping under
    // test: error = delete, purchase = spend patch, click/view = score
    // patch, signup = bare upsert
    val ops = Seq(
      (1L, 1L, "signup", 0.0), (1L, 2L, "click", 5.0), (1L, 3L, "purchase", 10.0),
      (2L, 1L, "click", 5.0), (2L, 2L, "error", 0.0),
      (3L, 1L, "signup", 0.0), (3L, 2L, "purchase", 10.0),
      (3L, 3L, "error", 0.0), (3L, 4L, "click", 7.0),
      (4L, 1L, "error", 0.0), (4L, 2L, "signup", 0.0),
      (5L, 2L, "click", 9.0), (5L, 1L, "click", 3.0))
      .toDF("user_id", "us", "event_type", "value")
      .withColumn("ets", timestamp_micros(col("us"))).drop("us")
    def render(df: org.apache.spark.sql.DataFrame) =
      StreamQueries.st18Finish(df).collect().map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).getNano / 1000,
        if (r.isNullAt(2)) -1.0 else r.getDouble(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    val got = render(StreamQueries.cdcAggOps(ops))
    assert(got === Seq(
      (1L, 3, 5.0, 10.0),   // plain row: both patches live
      //   user 2 absent: last op is the tombstone
      (3L, 4, 7.0, -1.0),   // re-created: patch after delete lives, before dies
      (4L, 2, -1.0, -1.0),  // delete then bare re-insert: blank row
      (5L, 2, 9.0, -1.0)))  // two patches of one column: last wins
    // associativity across any batch split: merge(agg(b1), agg(b2)) ≡ agg(all)
    val Array(b1, b2) = ops.randomSplit(Array(0.5, 0.5), seed = 7)
    assert(render(StreamQueries.cdcMerge(
      StreamQueries.cdcAggOps(b1), StreamQueries.cdcAggOps(b2))) === got)
  }

  test("st19 quality gate: multi-batch ≡ single run ≡ train+score batch twin") {
    import graft.queries.PipelineQueries
    import graft.functions.TextFunctions
    // Batch-split invariance: verdicts are per-doc facts under FROZEN
    // weights (trained on the standing split only), so slicing the
    // delta stream into micro-batches must change nothing.
    val dir = java.nio.file.Files.createTempDirectory("graft-st19-src").toString
    spark.read.parquet(s"$Sf0001/documents.parquet").repartition(4)
      .write.parquet(s"$dir/documents.parquet")
    val multi = StreamQueries.st19From(spark, dir, Some(1)).collect().toSeq
    val single = StreamQueries.st19(spark, Sf0001).collect().toSeq
    assert(multi === single)
    // Batch twin: train on the standing split, score the delta split
    // — the streamed gate must compute exactly this
    val docs = Tables.documents(spark, Sf0001)
    val w = TextFunctions.weakClassifierTrain(
      docs.filter(!PipelineQueries.isDeltaDoc), PipelineQueries.DsirTargetSources)
    val twin = TextFunctions.weakClassifierScore(
      docs.filter(PipelineQueries.isDeltaDoc), PipelineQueries.DsirTargetSources, w)
      .orderBy(col("doc_id")).collect().toSeq
    assert(single === twin)
    // every scorable (token-carrying) delta doc verdicted exactly once
    assert(single.map(_.getLong(0)).distinct.size === single.size)
    assert(single.nonEmpty)
    // the standing-trained model must not be the zero vector (the
    // stream would then pass everything with margin 0)
    assert(single.exists(_.getDouble(3) != 0.0))
  }
}
