package graft

import org.apache.spark.sql.functions.{col, expr}

import graft.queries.CoreQueries

/** §2.A sanity specs on sf0.001 (the DuckDB oracle is the strong gate;
  * these assert structural invariants cheaply in CI). */
class CoreQueriesSpec extends SparkTestBase {

  test("q01: group count and exact decimal-sum determinism") {
    val rows = CoreQueries.q01PricingSummary(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 9) // |returnflag| x |linestatus|
    val again = CoreQueries.q01PricingSummary(spark, Sf0001).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("q06 top-k is ordered and bounded") {
    val rows = CoreQueries.q06TopK(spark, Sf0001).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("q07 window rank keeps at most 2 orders per customer") {
    val rows = CoreQueries.q07WindowRank(spark, Sf0001).collect()
    val perCust = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perCust.forall(_ <= 2))
    assert(rows.map(_.getLong(1)).forall(rn => rn == 1L || rn == 2L))
  }

  test("q08 running sum is non-decreasing within each supplier") {
    val rows = CoreQueries.q08WindowRunning(spark, Sf0001).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sums = rs.map(_.getDouble(5))
      assert(sums.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-9))
    }
  }

  test("q09/q10 semi and anti partition the customer table") {
    val semi = CoreQueries.q09SemiJoin(spark, Sf0001).collect().map(_.getLong(0)).toSet
    val anti = CoreQueries.q10AntiJoin(spark, Sf0001).collect().map(_.getLong(0)).toSet
    val all = Tables.customer(spark, Sf0001).count()
    // semi(status F) and anti(no urgent order) overlap is legal; each ⊆ customers
    assert(semi.size <= all && anti.size <= all)
    assert(semi.nonEmpty)
  }

  test("q12 rollup contains the grand-total row") {
    val rows = CoreQueries.q12Rollup(spark, Sf0001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getLong(2) === Tables.customer(spark, Sf0001).count())
  }

  test("q72 decay: exact power-of-two weighting replayed in the JVM") {
    val rows = CoreQueries.q72DecayAgg(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.nonEmpty)
    // JVM replay: same anchor, same integer ages, same exact 2^-age scaling
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val maxNs = ev.map(_._2).max
    val want = ev.groupBy(_._1).map { case (t, es) =>
      val dec = es.map { case (_, ts, v) =>
        val age = (maxNs - ts) / 86400000000000L
        if (age <= 62) BigDecimal(v / (1L << age).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) else BigDecimal(0)
      }.sum
      t -> dec.toDouble
    }
    want.foreach { case (t, d) =>
      assert(math.abs(rows(t)._2 - d) < 1e-9, s"$t decayed")
      assert(rows(t)._2.abs <= rows(t)._3.abs + 1e-6 || rows(t)._3 >= 0)
    }
  }

  test("q21 session counts bounded by event counts") {
    val rows = CoreQueries.q21Sessionize(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 1L && r.getLong(1) <= r.getLong(2)))
  }

  test("q27 funnel: purchases strictly inside (t0, t0+24h] of first click") {
    import org.apache.spark.sql.functions.{col, min}
    val rows = CoreQueries.q27Funnel(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // cross-check one user against raw events
    val u = rows.head.getLong(0)
    val ev = Tables.events(spark, Sf0001).filter(col("user_id") === u)
    val t0 = ev.filter(col("event_type") === "click").agg(min("ts")).collect().head.getLong(0)
    val n = ev.filter(col("event_type") === "purchase")
      .collect().map(_.getAs[Long]("ts"))
      .count(t => t > t0 && t - t0 <= 24L * 3600L * 1000L * 1000L * 1000L)
    assert(rows.head.getLong(1) === n.toLong)
  }

  test("q29 approx distinct within 5% of exact") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val approx = CoreQueries.q29ApproxDistinct(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (p, s)) =>
      val (ap, as_) = approx(k)
      assert(math.abs(ap - p).toDouble / p <= 0.05, s"$k parts: $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s <= 0.05, s"$k supps: $as_ vs $s")
    }
  }

  test("q66 HLL rollup: day and ALL estimates within 2% of exact; union ≡ one-shot") {
    import org.apache.spark.sql.functions._
    val got = CoreQueries.q66HllRollup(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val events = Tables.events(spark, Sf0001)
      .select(col("event_type"),
        date_trunc("day", timestamp_micros(expr("ts div 1000"))).cast("date").cast("string").as("day"),
        col("user_id"))
    val exactDays = events.groupBy(col("event_type"), col("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exactTotals = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), "ALL") -> r.getLong(1)).toMap
    val exact = exactDays ++ exactTotals
    assert(got.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(got(k) - n).toDouble / math.max(n, 1L) <= 0.02,
        s"$k: sketch ${got(k)} vs exact $n")
    }
    // re-aggregation fidelity: the unioned day sketches estimate the
    // same cardinality as one sketch built over the whole table
    val oneShot = events.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    oneShot.foreach { case (et, n) =>
      assert(got((et, "ALL")) === n, s"$et: union rollup ${got((et, "ALL"))} != one-shot $n")
    }
  }

  test("q67 KLL rollup: every estimate's true rank within the sketch's error bound") {
    import org.apache.spark.sql.functions._
    val got = CoreQueries.q67KllRollup(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Seq(0.5 -> r.getDouble(2), 0.95 -> r.getDouble(3), 0.99 -> r.getDouble(4))).toMap
    val orders = Tables.orders(spark, Sf0001)
      .select(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month"),
        col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    def check(key: (String, String), values: Array[Double]): Unit = {
      val n = values.length.toDouble
      got(key).foreach { case (p, est) =>
        val rank = values.count(_ <= est) / n
        // k=200 → ~1.65% rank error at 99% confidence; for tiny
        // groups one order statistic can be worth > 2.5% of rank, so
        // allow the 1-element discretization on top of the bound
        assert(math.abs(rank - p) <= 0.025 + 1.0 / n,
          s"$key p$p: est $est has true rank $rank over ${values.length} values")
      }
    }
    orders.groupBy(r => (r._1, r._2)).foreach { case (key, vs) =>
      check(key, vs.map(_._3).toArray)
    }
    orders.groupBy(_._1).foreach { case (prio, vs) =>
      check((prio, "ALL"), vs.map(_._3).toArray)
    }
    assert(got.keySet.count(_._2 == "ALL") === orders.map(_._1).distinct.length)
  }

  test("q68 theta overlap: union, intersection and difference estimates within 5% of exact") {
    import org.apache.spark.sql.functions._
    val got = CoreQueries.q68ThetaOverlap(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val users = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def close(est: Double, exact: Int): Unit =
      assert(math.abs(est - exact) <= math.max(0.05 * exact, 2.0), s"est $est vs exact $exact")
    got.foreach { case ((ta, tb), (ea, eb, eBoth, eOnlyA)) =>
      val (sa, sb) = (users(ta), users(tb))
      close(ea, sa.size); close(eb, sb.size)
      close(eBoth, (sa & sb).size); close(eOnlyA, (sa -- sb).size)
    }
    val types = users.keySet.toSeq.sorted
    assert(got.keySet === (for { a <- types; b <- types if a < b } yield (a, b)).toSet)
  }

  test("q36 latest event agrees with a window-rank reference") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val got = CoreQueries.q36LatestEvent(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val ref = Tables.events(spark, Sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    assert(got === ref)
  }

  test("q37 approx quantiles have bounded rank error vs exact") {
    import org.apache.spark.sql.functions.col
    val approx = CoreQueries.q37ApproxQuantile(spark, Sf0001).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val raw = Tables.events(spark, Sf0001).select(col("event_type"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(approx.keySet === raw.keySet)
    for ((k, sorted) <- raw; (q, v) <- Seq(0.5, 0.9, 0.99).zip(approx(k))) {
      val rank = sorted.count(_ <= v).toDouble / sorted.length
      assert(math.abs(rank - q) <= 0.05 + 1.0 / sorted.length,
        s"$k q=$q: value $v has rank $rank")
    }
  }

  test("q28 json props: k extraction covers every event") {
    val rows = CoreQueries.q28JsonProps(spark, Sf0001).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.events(spark, Sf0001).count())
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(4) <= 99L) // props k ∈ [0, 99]
      assert(r.getLong(2) >= r.getLong(1) * r.getLong(3))
    }
  }

  test("q50 cohort cells reconcile: week-0 actives equal cohort sizes") {
    import org.apache.spark.sql.functions.{col, countDistinct, expr}
    val rows = CoreQueries.q50CohortRetention(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // every user is active in their own first week → the offset-0 cell
    // of each cohort counts exactly that cohort's population
    val cohortSizes = Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(expr("min(ts) div 604800000000000").as("cw"))
      .groupBy(col("cw")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) === cohortSizes(r.getLong(0)))
    }
    rows.foreach(r => assert(r.getLong(1) >= 0L))
  }

  test("q44 DataFrame plan equals Catalyst's EXISTS/NOT-EXISTS rewrite of the same SQL") {
    graft.queries.SqlQueries.registerViews(spark, Sf0001)
    val df = CoreQueries.q44ExclusiveLate(spark, Sf0001).collect()
    val sql = spark.sql(CoreQueries.q44Sql).collect()
    assert(df.map(_.toSeq).toSeq === sql.map(_.toSeq).toSeq)
    assert(df.nonEmpty)
  }

  test("q45 brand sets are sorted, distinct, and sized consistently") {
    val rows = CoreQueries.q45BrandSets(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val brands = r.getString(1).split(",").toSeq
      assert(brands === brands.sorted)
      assert(brands.distinct.size === brands.size)
      assert(brands.size.toLong === r.getLong(2))
    }
  }

  test("q46 DataFrame plan equals the correlated-subquery SQL") {
    graft.queries.SqlQueries.registerViews(spark, Sf0001)
    val df = CoreQueries.q46CorrelatedAvg(spark, Sf0001).collect()
    val sql = spark.sql(CoreQueries.q46Sql).collect()
    assert(df.map(_.toSeq).toSeq === sql.map(_.toSeq).toSeq)
    assert(df.nonEmpty)
  }

  test("q55 conversion counts equal a JVM-regex reference for every user") {
    val out = CoreQueries.q55SequenceMatch(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = Tables.events(spark, Sf0001)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pat = "click( view)* purchase".r
    val ref = ev.groupBy(_._1).map { case (u, rs) =>
      val path = rs.map(e => (e._2, e._3, e._4)).sortBy(e => (e._1, e._2))
        .map(_._3).mkString(" ")
      u -> ((rs.length.toLong, pat.findAllIn(path).length.toLong))
    }
    assert(out.keySet === ref.keySet)
    ref.foreach { case (u, expected) => assert(out(u) === expected, s"user $u") }
    // the pattern actually fires somewhere in the corpus
    assert(out.values.map(_._2).sum > 0L)
  }

  test("q81 corpus shuffle: exact permutation, seed-keyed, JVM md5 reference order") {
    val out = CoreQueries.q81CorpusShuffle(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = Tables.documents(spark, Sf0001).count()
    // positions are exactly 1..n — a bijection, no gaps or dups
    assert(out.map(_._1).toSeq === (1L to n).toSeq)
    // the order is the md5(seed:doc_id) order computed independently
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String =
      md.digest(s"42:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ref = out.map(_._2).sorted.map(id => (key(id), id)).sorted.map(_._2)
    assert(out.sortBy(_._1).map(_._2).toSeq === ref.toSeq)
    // stored key column matches the JVM digest (both lowercase hex)
    out.take(20).foreach { case (_, id, k) => assert(k === key(id)) }
  }

  test("q82 rolling z-score equals a JVM replay of the decimal sums + IEEE tree") {
    val dayNs = 86400000000000L
    val raw = Tables.events(spark, Sf0001)
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // daily DECIMAL(18,6) totals, exactly as the plan accumulates them
    val daily = raw.groupBy(t => (t._1, t._2)).map { case ((ty, day), rows) =>
      val s = rows.map(t => BigDecimal(t._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _)
      (ty, day, s)
    }.toSeq
    val ref = daily.groupBy(_._1).flatMap { case (ty, ds) =>
      val byDay = ds.map(t => t._2 -> t._3).toMap
      byDay.keys.toSeq.sorted.map { day =>
        val frame = (day - 6 to day).flatMap(byDay.get)
        val n = frame.size.toLong
        val s1d = frame.sum.toString.toDouble
        val s2d = frame.map(v => v * v).sum.toString.toDouble
        val vd = byDay(day).toString.toDouble
        val mean = s1d / n
        val std = math.sqrt(math.max(s2d / n - mean * mean, 0.0))
        val z = if (n >= 4 && std > 0.0) Some((vd - mean) / std) else None
        ((ty, day), (vd, n, mean, std, z))
      }
    }
    val got = CoreQueries.q82RollingZscore(spark, Sf0001).collect().map { r =>
      ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    }.toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (k, e) => assert(got(k) === e, s"cell $k") }
    // the frame warms up: early days carry no z, mature days do
    assert(got.values.exists(_._5.isDefined) && got.values.exists(_._5.isEmpty))
  }

  test("q83 weighted median equals a JVM replay of the crossing rule") {
    val raw = Tables.lineitem(spark, Sf0001)
      .selectExpr("l_returnflag AS grp",
        "cast(round(l_extendedprice * 100) as long) AS v",
        "cast(l_quantity as long) AS wt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = raw.groupBy(_._1).map { case (g, rows) =>
      val total = rows.map(_._3).sum
      val target = (total + 1) / 2
      val sorted = rows.groupBy(_._2).map { case (v, rs) => v -> rs.map(_._3).sum }
        .toSeq.sortBy(_._1)
      var cum = 0L
      val med = sorted.collectFirst {
        case (v, w) if { cum += w; cum >= target } => v
      }.get
      g -> ((med, total))
    }
    val got = CoreQueries.q83WeightedMedian(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("q84 delta-join terms partition the view delta: disjoint, complete, duplicate-free") {
    val out = CoreQueries.q84IncrementalJoin(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // no duplicates: the three maintenance terms must not overlap the
    // standing view or each other (each row has exactly one (Δ?, Δ?)
    // signature, so the union is a partition)
    assert(out.length === out.distinct.length)
    // completeness: equals the full recompute
    val full = Tables.orders(spark, Sf0001)
      .join(Tables.customer(spark, Sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq === full.sorted.toSeq)
    // the delta split is live: both sides contribute rows
    val oDelta = Tables.orders(spark, Sf0001)
      .filter(expr("substring(md5(cast(o_orderkey as string)), 1, 1) = '0'")).count()
    val cDelta = Tables.customer(spark, Sf0001)
      .filter(expr("substring(md5(cast(c_custkey as string)), 1, 1) = '0'")).count()
    assert(oDelta > 0 && cDelta > 0)
  }

  test("q85 equi-depth boundaries equal the sorted-multiset ranks exactly") {
    val vs = Tables.lineitem(spark, Sf0001)
      .selectExpr("cast(round(l_extendedprice * 100) as long) AS v")
      .collect().map(_.getLong(0)).sorted
    val n = vs.length.toLong
    val ref = (1 to 16).map { k =>
      val rk = (k * n + 15) / 16
      (k.toLong, rk, vs((rk - 1).toInt)) // value at rank rk (1-based)
    }
    val got = CoreQueries.q85EquiDepthHist(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === ref)
    // boundaries are monotone and the last one is the maximum
    assert(got.map(_._3) === got.map(_._3).sorted && got.last._3 === vs.last)
  }

  test("q85 boundaries stay exact under heavy ties (duplicated quantity values)") {
    // equi-depth's subtle case: one value spanning several target
    // ranks must serve all of them; l_quantity has ~50 distinct values
    // across thousands of rows, so every boundary lands in a tie run
    val vs = Tables.lineitem(spark, Sf0001)
      .selectExpr("cast(l_quantity as long) AS v").collect().map(_.getLong(0)).sorted
    val n = vs.length.toLong
    val ref = (1 to 16).map { k =>
      val rk = (k * n + 15) / 16
      (k.toLong, rk, vs((rk - 1).toInt))
    }
    val got = CoreQueries.equiDepthBoundaries(
        Tables.lineitem(spark, Sf0001).selectExpr("cast(l_quantity as long) AS v"),
        buckets = 16, bucketWidth = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === ref)
  }

  test("q56 MAD outliers equal a JVM median/MAD reference per group") {
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Spark percentile(0.5): linear interpolation at index (n-1)/2
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted; val pos = (s.length - 1) * 0.5
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val raw = Tables.orders(spark, Sf0001)
      .selectExpr("o_orderpriority", "CAST(o_totalprice AS DOUBLE) AS v")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val ref = raw.groupBy(_._1).map { case (p, rows) =>
      val vs = rows.map(_._2).toSeq
      val med = round4(median(vs))
      val devs = vs.map(v => math.abs(v - med))
      val mad = round4(median(devs))
      p -> ((med, mad, vs.length.toLong, devs.count(_ > mad * 3.0).toLong))
    }
    val out = CoreQueries.q56MadOutliers(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === ref.keySet)
    ref.foreach { case (p, e) => assert(out(p) === e, s"group $p") }
    // uniform-ish prices legitimately yield zero 3·MAD outliers at
    // this SF — assert the scale statistics are live, not the count
    assert(out.values.forall(v => v._2 > 0.0 && v._3 > 0L))
  }

  test("q86 changepoint: planted level shift found at the shift day; constant series ties to earliest") {
    import spark.implicits._
    // type "shift": 1.0 for days 1–5 then 11.0 for days 6–10. Scaled
    // dev_d = n·S_d − d·T peaks at day 5 (|−250|; day 4 and day 6
    // both −200), and the unscaled CUSUM peak is −250/10 = −25.
    // type "flat": constant series ⇒ dev ≡ 0 for every day ⇒ the
    // earliest-day tie rule must pick day 1.
    val daily = ((1 to 10).map(d => ("shift", d.toLong, if (d <= 5) 1.0 else 11.0)) ++
      (1 to 10).map(d => ("flat", d.toLong, 7.0)))
      .toDF("event_type", "day", "v0")
      .select(col("event_type"), col("day"),
        col("v0").cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("v"))
    val out = CoreQueries.changepointOf(daily).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("shift") === ((5L, 10L, -25.0)))
    assert(out("flat") === ((1L, 10L, 0.0)))
  }

  test("q89 pareto front: dominance fixture exact; staircase sweep ≡ brute-force dominance on real data") {
    import spark.implicits._
    // Hand fixture: dominated rows drop on BOTH dominance arms
    // (strictly-cheaper-with-≥-size, same-price-with->-size) and equal
    // (price, size) duplicates BOTH stay (no strict axis).
    val part = Seq(
      (1L, "B1", 2, 0.5), // front: cheapest
      (2L, "B1", 5, 1.0), // front
      (3L, "B1", 3, 1.0), // dominated: same price, smaller size
      (4L, "B1", 5, 2.0), // dominated: 2 is cheaper at equal size
      (5L, "B1", 7, 2.0), // front
      (6L, "B2", 7, 2.0), // duplicate (price, size) of 5 — both stay
      (7L, "B1", 7, 3.0), // dominated: 5 is cheaper at equal size
      (8L, "B1", 9, 3.0)  // front
    ).toDF("p_partkey", "p_brand", "p_size", "p_retailprice")
    val out = CoreQueries.paretoFrontOf(part).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(out === Seq((1L, 2L, 0.5), (2L, 5L, 1.0), (5L, 7L, 2.0),
      (6L, 7L, 2.0), (8L, 9L, 3.0)))
    // Real data: the sweep must equal the quadratic dominance
    // definition applied literally (the oracle-of-the-oracle)
    val rows = Tables.part(spark, Sf0001)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val brute = rows.filter { case (_, s0, p0) =>
      !rows.exists { case (_, s1, p1) =>
        p1 <= p0 && s1 >= s0 && (p1 < p0 || s1 > s0) }
    }.map(r => (r._1, r._2.toLong, r._3)).sortBy(r => (r._3, r._1)).toSeq
    val swept = CoreQueries.q89ParetoFront(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(swept === brute)
    assert(swept.nonEmpty)
  }

  test("q91 acf: exact period-7 series peaks at lag 7; constant and short series are NULL") {
    import spark.implicits._
    import java.math.{BigDecimal => JBD}
    def daily(tpe: String, vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) =>
        (tpe, i.toLong, new JBD(v.toString).setScale(6)) }
    // 35 days of an exact 7-period sawtooth: at lag 7 every pair is
    // (x, x) so r = 1; at lag 1 the pattern decorrelates below 1.
    val saw = daily("saw", (0 until 35).map(i => (i % 7 + 1).toDouble))
    // constant series: zero variance -> NULL at every lag
    val const = daily("const", Seq.fill(20)(5.0))
    // short series: 8 days leaves 8 - lag < 8 pairs everywhere -> NULL
    val short = daily("short", (0 until 8).map(_.toDouble + 1))
    val df = (saw ++ const ++ short).toDF("event_type", "day", "v")
      .select(col("event_type"), col("day"),
        col("v").cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("v"))
    val out = CoreQueries.acfOf(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("saw", 7L)).exists(v => math.abs(v - 1.0) < 1e-12),
      s"lag-7 acf of an exact 7-period series must be 1, got ${out(("saw", 7L))}")
    assert(out(("saw", 1L)).exists(v => v < 0.9), "lag-1 acf should decorrelate")
    (1L to 7L).foreach { l =>
      assert(out(("const", l)) === None, s"constant series lag $l must be NULL")
      assert(out(("short", l)) === None, s"8-day series lag $l must be NULL (< 8 pairs)")
    }
    // every defined coefficient is a correlation: |r| <= 1 (+ ulp)
    assert(out.values.flatten.forall(v => math.abs(v) <= 1.0 + 1e-12))
  }

  test("q92 rfm: driver-side replay of the exact quintile cuts and scores") {
    val out = CoreQueries.q92RfmSegments(spark, Sf0001).collect()
    assert(out.nonEmpty)
    // replay the definition literally: cut k = sorted value at rank
    // ceil(k*N/5); bucket(v) = 1 + #{cuts < v}; r reversed
    def cuts(vs: Array[Long]): Seq[Long] = {
      val s = vs.sorted; val n = vs.length.toLong
      (1 to 4).map(k => s(((k * n + 4) / 5).toInt - 1))
    }
    def b(v: Long, cs: Seq[Long]): Long = 1L + cs.count(v > _)
    val rc = cuts(out.map(_.getLong(1)))
    val fc = cuts(out.map(_.getLong(2)))
    val mc = cuts(out.map(_.getLong(3)))
    out.foreach { r =>
      assert(r.getLong(4) === 6L - b(r.getLong(1), rc), s"r mismatch at ${r.getLong(0)}")
      assert(r.getLong(5) === b(r.getLong(2), fc), s"f mismatch at ${r.getLong(0)}")
      assert(r.getLong(6) === b(r.getLong(3), mc), s"m mismatch at ${r.getLong(0)}")
      assert(r.getLong(7) === r.getLong(4) * 100 + r.getLong(5) * 10 + r.getLong(6))
      (4 to 6).foreach(i => assert(r.getLong(i) >= 1L && r.getLong(i) <= 5L))
    }
    // quintiles discriminate: monetary cents are near-unique, so all
    // five m buckets are populated
    assert(out.map(_.getLong(6)).distinct.sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("q96 ship latency: driver-side replay of the exact rank crossings") {
    import org.apache.spark.sql.functions.{to_date, datediff}
    val o = Tables.orders(spark, Sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"), to_date(col("o_orderdate")).as("od"))
    val l = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
    val lat = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), datediff(col("sd"), col("od")).cast("long").as("days"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).sorted }
    def rank(vs: Array[Long], q: Long): Long = vs(((vs.length * q + 99) / 100 - 1).toInt)
    val out = CoreQueries.q96ShipLatency(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val vs = lat(r.getString(0))
      assert(r.getLong(1) === vs.length.toLong)
      assert(r.getLong(2) === rank(vs, 50), s"p50 mismatch for ${r.getString(0)}")
      assert(r.getLong(3) === rank(vs, 90), s"p90 mismatch for ${r.getString(0)}")
      assert(r.getLong(4) === rank(vs, 99), s"p99 mismatch for ${r.getString(0)}")
      assert(r.getDouble(5) === vs.count(_ > 30).toDouble / vs.length)
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("q94 table diff: the inverse law — applying the diff to v1 reconstructs v2 exactly") {
    val (v1, v2) = CoreQueries.q94Snapshots(spark, Sf0001)
    val diff = CoreQueries.q94DiffOf(v1, v2).collect()
    assert(Set("I", "U", "D").subsetOf(diff.map(_.getString(1)).toSet),
      "fixture must exercise all three change types")
    // apply: drop D keys, overwrite U rows with the new values, add I rows
    val byType = diff.groupBy(_.getString(1))
    val dKeys = byType("D").map(_.getLong(0)).toSet
    val uRows = byType("U").map(r => r.getLong(0) -> (r.getDouble(4), r.getString(6))).toMap
    val iRows = byType("I").map(r => (r.getLong(0), r.getDouble(4), r.getString(6)))
    val applied = v1.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .filterNot { case (k, _, _) => dKeys(k) }
      .map { case (k, bal, seg) =>
        uRows.get(k).fold((k, bal, seg)) { case (nb, ns) => (k, nb, ns) } } ++ iRows
    val want = v2.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(applied.sortBy(_._1).toSeq === want.sortBy(_._1).toSeq,
      "apply(v1, diff) diverged from v2")
    // U rows carry a non-empty, correctly-ordered change set
    byType("U").foreach { r =>
      assert(r.getString(2).nonEmpty)
      assert(Seq("c_acctbal", "c_mktsegment", "c_acctbal,c_mktsegment")
        .contains(r.getString(2)))
    }
  }

  test("q97 skew report: driver-side replay of top-10 keys, shares and skew factors") {
    val out = CoreQueries.q97SkewReport(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val counts = Tables.orders(spark, Sf0001)
      .groupBy("o_custkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nKeys = counts.length.toLong
    val nTotal = counts.map(_._2).sum
    val expect = counts.sortBy { case (k, n) => (-n, k) }.take(10)
      .map { case (k, n) =>
        (k, n, n.toDouble / nTotal, (n * nKeys).toDouble / nTotal) }
    assert(out.toSeq === expect.toSeq)
    assert(out.length === 10)
  }

  test("q98 cohort ltv: driver-side replay of cohorts, ages, running totals and per-customer value") {
    val out = CoreQueries.q98CohortLtv(spark, Sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val orders = Tables.orders(spark, Sf0001)
      .selectExpr("o_custkey", "year(cast(o_orderdate as date)) * 12 + month(cast(o_orderdate as date)) as ym",
        "cast(round(o_totalprice * 100) as long) as cents").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val first = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohortSize = first.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = orders.groupBy(o => (first(o._1).toLong, (o._2 - first(o._1)).toLong))
      .map { case (k, os) => k -> (os.map(_._1).distinct.size.toLong, os.map(_._3).sum) }
    assert(out.keySet === cells.keySet)
    cells.foreach { case ((cym, age), (nActive, rev)) =>
      val cum = cells.filter { case ((c, a), _) => c == cym && a <= age }.values.map(_._2).sum
      val n = cohortSize(cym.toInt)
      assert(out((cym, age)) === ((nActive, rev, cum, n, cum.toDouble / n)),
        s"cohort $cym age $age")
    }
  }

  test("q99 gini: driver-side replay of exact ranks, gini and top-decile share") {
    val out = CoreQueries.q99GiniConcentration(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val rev = Tables.orders(spark, Sf0001)
      .selectExpr("o_custkey", "cast(round(o_totalprice * 100) as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val segOf = Tables.customer(spark, Sf0001)
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val bySeg = rev.toSeq.map { case (ck, x) => (segOf(ck), ck, x) }.groupBy(_._1)
    assert(out.keySet === bySeg.keySet)
    bySeg.foreach { case (sg, rows) =>
      // the exact rank formula over the (revenue, custkey)-sorted list —
      // what the two-phase bucket-offset machinery must reproduce
      val sorted = rows.sortBy(t => (t._3, t._2))
      val n = sorted.size.toLong
      val sx = sorted.map(t => BigInt(t._3)).sum
      val six = sorted.zipWithIndex
        .map { case (t, i0) => BigInt(i0 + 1) * BigInt(t._3) }.sum
      val k = n / 10
      val topx = sorted.drop((n - k).toInt).map(t => BigInt(t._3)).sum
      val gini = (2.0 * six.toDouble) / (n.toDouble * sx.toDouble) -
        (n + 1).toDouble / n.toDouble
      assert(out(sg) === ((n, sx.toDouble / 100.0, gini,
        topx.toDouble / sx.toDouble)), s"segment $sg")
      assert(gini > 0.0 && gini < 1.0)
      // with any inequality at all, the top decile holds > 1/10 of mass
      assert(topx.toDouble / sx.toDouble > 0.1)
    }
  }
}
