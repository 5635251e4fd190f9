package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.SqlQueries
import graft.sources.CsvIngest

/** CSV ingestion + SQL-string entry specs. */
class SqlQueriesSpec extends SparkTestBase {

  test("q23 CSV round-trip: CSV-sourced aggregate equals the parquet answer") {
    val fromCsv = SqlQueries.q23(spark, Sf0001).collect()
    val fromParquet = Tables.customer(spark, Sf0001)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(DecimalType(18, 6))).cast("double").as("sum_acctbal"),
        min(col("c_custkey")).as("min_key"), max(col("c_custkey")).as("max_key"))
      .orderBy(col("c_mktsegment")).collect()
    assert(fromCsv.toSeq === fromParquet.toSeq)
    assert(fromCsv.nonEmpty)
  }

  test("CSV loader applies the explicit schema (no inference)") {
    val df = CsvIngest.customerCsv(spark, Sf0001)
    assert(df.schema === CsvIngest.customerSchema)
    assert(df.count() === Tables.customer(spark, Sf0001).count())
  }

  test("q26 JSON round-trip: JSONL-sourced aggregate equals the parquet answer") {
    val fromJson = SqlQueries.q26(spark, Sf0001).collect()
    val fromParquet = Tables.documents(spark, Sf0001)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_text_len"))
      .orderBy(col("lang"), col("source")).collect()
    assert(fromJson.toSeq === fromParquet.toSeq)
    assert(fromJson.nonEmpty)
  }

  test("q24 SQL text equals the DataFrame-API computation") {
    val viaSql = SqlQueries.q24(spark, Sf0001).collect()
    val viaApi = Tables.lineitem(spark, Sf0001)
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(18, 6)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("ship_year")).collect()
    assert(viaSql.toSeq === viaApi.toSeq)
    assert(viaSql.nonEmpty)
  }

  test("q25 SQL join/having returns stable, non-empty groups") {
    val a = SqlQueries.q25(spark, Sf0001).collect()
    val b = SqlQueries.q25(spark, Sf0001).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    a.foreach(r => assert(r.getLong(2) > 10))
  }

  test("q43 grouping sets: levels reconcile with the plain aggregate") {
    val rows = SqlQueries.q43(spark, Sf0001).collect()
    val nOrders = Tables.orders(spark, Sf0001).count()
    // exactly the three requested levels, flagged by GROUPING()
    val levels = rows.map(r => (r.getLong(2), r.getLong(3))).distinct.sorted
    assert(levels.toSeq === Seq((0L, 0L), (0L, 1L), (1L, 0L)))
    // every level partitions the order count
    levels.foreach { case (gs, gp) =>
      val n = rows.filter(r => r.getLong(2) == gs && r.getLong(3) == gp)
        .map(_.getLong(4)).sum
      assert(n === nOrders, s"level ($gs,$gp)")
    }
    // aggregated-away keys are NULL exactly when their flag is 1
    rows.foreach { r =>
      assert(r.isNullAt(0) === (r.getLong(2) == 1L))
      assert(r.isNullAt(1) === (r.getLong(3) == 1L))
    }
  }

  test("q53 Avro round-trip: Avro-sourced aggregate equals the parquet answer") {
    val fromAvro = SqlQueries.q53(spark, Sf0001).collect()
    val fromParquet = Tables.supplier(spark, Sf0001)
      .groupBy(col("s_nationkey").cast("long").as("nation_key"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast(DecimalType(18, 6))).cast("double").as("sum_acctbal"),
        min(col("s_suppkey")).as("min_key"), max(col("s_suppkey")).as("max_key"))
      .orderBy(col("nation_key")).collect()
    assert(fromAvro.toSeq === fromParquet.toSeq)
    assert(fromAvro.nonEmpty)
  }

  test("q54 exact-moment stats agree with Spark's built-in estimators") {
    val rows = SqlQueries.q54(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val ref = Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n"),
        stddev_pop(col("l_quantity")).as("sd"),
        skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"), // Spark reports EXCESS kurtosis
        corr(col("l_quantity"), col("l_extendedprice")).as("co"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    rows.foreach { r =>
      val (n, sd, sk, ku, co) = ref(r.getString(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(3) - sd) < 1e-9, "std")
      assert(math.abs(r.getDouble(4) - sk) < 1e-9, "skew")
      assert(math.abs((r.getDouble(5) - 3.0) - ku) < 1e-9, "kurtosis")
      assert(math.abs(r.getDouble(6) - co) < 1e-9, "corr")
    }
  }

  test("q71 regression matches Spark's native regr_slope/regr_intercept") {
    import graft.queries.SqlQueries
    val rows = SqlQueries.q71(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val ref = Tables.part(spark, Sf0001)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        expr("regr_slope(p_retailprice, p_size)").as("sl"),
        expr("regr_intercept(p_retailprice, p_size)").as("ic"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    rows.foreach { r =>
      val (n, sl, ic) = ref(r.getString(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - sl) < 1e-6, s"slope ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - ic) < 1e-6, s"intercept ${r.getString(0)}")
    }
  }
}
