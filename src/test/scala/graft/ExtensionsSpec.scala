package graft

/** GraftExtensions: the session was built with
  * `spark.sql.extensions=graft.GraftExtensions` (SparkTestBase), so
  * every native function must resolve from plain SQL text with no
  * VectorFunctions.register call. */
class ExtensionsSpec extends SparkTestBase {

  test("injected functions resolve from plain SQL without register()") {
    val row = spark.sql(
      """SELECT
        | graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |           array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        | graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |              array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        | graft_nfc('café') AS nfc,
        | size(graft_winnow('abcdefghijklmnop', 4, 2)) AS n_fps""".stripMargin).head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 1.0)
    assert(row.getString(2) === "café")
    assert(row.getInt(3) > 0)
  }

  test("injected aggregate graft_simhash64 resolves from SQL") {
    import spark.implicits._
    Seq(("a", 1L), ("b", 2L)).toDF("k", "h").createOrReplaceTempView("ext_agg_t")
    val r = spark.sql("SELECT graft_simhash64(h) AS sig FROM ext_agg_t").head()
    assert(!r.isNullAt(0))
  }
}
