package graft

import org.apache.spark.sql.types._

/** Preflight gate on the driver-generated testdata: asserts the full
  * loaded schema of all 10 tables as seen THROUGH [[Tables]] (i.e. after
  * loader normalization). Exists because the physical type of
  * `events.ts` changed between rounds (TIMESTAMP(NANOS) → TIMESTAMP
  * (MICROS)) and silently broke 15 queries for two rounds — data drift
  * must fail ONE named test here, not N queries downstream.
  *
  * The assertions pin the post-loader contract every query relies on
  * (`events.ts` is INT64 nanoseconds regardless of physical encoding);
  * the date columns are pinned loosely (timestamp-or-date) since both
  * read fine through `date_trunc`/`cast("date")` paths.
  */
class TestDataPreflightSpec extends SparkTestBase {

  private def fields(name: String, load: => org.apache.spark.sql.DataFrame): Map[String, DataType] = {
    val df = load
    assert(df.head(1).nonEmpty, s"$name is empty")
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  private def tsLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == DateType

  test("region/nation/customer/supplier/part schemas") {
    assert(fields("region", Tables.region(spark, Sf0001)) ===
      Map("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields("nation", Tables.nation(spark, Sf0001)) ===
      Map("n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assert(fields("customer", Tables.customer(spark, Sf0001)) ===
      Map("c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assert(fields("supplier", Tables.supplier(spark, Sf0001)) ===
      Map("s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
        "s_acctbal" -> DoubleType))
    assert(fields("part", Tables.part(spark, Sf0001)) ===
      Map("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
        "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("orders/lineitem schemas (date columns timestamp-or-date)") {
    val o = fields("orders", Tables.orders(spark, Sf0001))
    assert(o.keySet === Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    assert(o("o_orderkey") === LongType && o("o_custkey") === LongType)
    assert(o("o_totalprice") === DoubleType)
    assert(tsLike(o("o_orderdate")), s"o_orderdate unexpected: ${o("o_orderdate")}")

    val l = fields("lineitem", Tables.lineitem(spark, Sf0001))
    assert(l.keySet === Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    assert(l("l_orderkey") === LongType && l("l_partkey") === LongType && l("l_suppkey") === LongType)
    assert(l("l_linenumber") === IntegerType)
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .foreach(c => assert(l(c) === DoubleType, s"$c unexpected: ${l(c)}"))
    assert(tsLike(l("l_shipdate")), s"l_shipdate unexpected: ${l("l_shipdate")}")
  }

  test("events schema — ts MUST load as INT64 nanoseconds via Tables.events") {
    val e = fields("events", Tables.events(spark, Sf0001))
    assert(e === Map("event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
    // sanity: values are plausibly ns-since-epoch (year 2000–2100 band),
    // catching a loader that silently yields micros or seconds instead
    val ts0 = Tables.events(spark, Sf0001).select("ts").head().getLong(0)
    assert(ts0 > 9.4e17 && ts0 < 4.2e18, s"ts=$ts0 not in the ns-since-epoch band")
  }

  test("documents/embeddings schemas") {
    assert(fields("documents", Tables.documents(spark, Sf0001)) ===
      Map("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType))
    val em = fields("embeddings", Tables.embeddings(spark, Sf0001))
    assert(em.keySet === Set("vec_id", "embedding", "label"))
    assert(em("vec_id") === LongType && em("label") === IntegerType)
    assert(em("embedding").isInstanceOf[ArrayType] &&
      em("embedding").asInstanceOf[ArrayType].elementType === FloatType,
      s"embedding unexpected: ${em("embedding")}")
  }
}
