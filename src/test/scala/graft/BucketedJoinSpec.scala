package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedTables

/** Bucketed-layout spec: the write-once-shuffle-never contract of
  * BucketedTables — a join AND a groupBy on the bucket key must plan
  * with zero Exchange operators (SURVEY.md §5). */
class BucketedJoinSpec extends SparkTestBase {

  test("co-bucketed tables join and aggregate with zero shuffle exchanges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val li = Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, Sf0001).select(col("o_orderkey"), col("o_orderpriority"))
    BucketedTables.writeBucketed(li, "li_b", s"$tmp/li", "l_orderkey", 8, Seq("l_orderkey"))
    BucketedTables.writeBucketed(ord, "ord_b", s"$tmp/ord", "o_orderkey", 8, Seq("o_orderkey"))
    // forbid broadcast so the join would otherwise be a shuffled SMJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      assert(j.collect().nonEmpty)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
