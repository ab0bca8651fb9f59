package graft

import org.apache.spark.sql.functions._

/** Bucketing: the at-rest co-location story from SCALE.md made
  * executable. Writing both fact tables bucketed (and sorted) by the
  * join key lets the orderkey join run with ZERO shuffle exchanges —
  * at 100 TB this is the difference between a join that moves both
  * tables over the network every query and one that never moves them
  * at all (bucket files align 1:1 across tables).
  */
class BucketSpec extends SparkSpec {

  // resetTable (catalog + warehouse-dir cleanup) comes from SparkSpec

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    import spark.implicits._
    resetTable("orders_bkt")
    resetTable("lineitem_bkt")
    Tables.orders(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    Tables.lineitem(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")

    // at test SF the planner would (rightly) broadcast tiny orders and
    // ignore bucketing; disable broadcast to surface the co-located
    // sort-merge path a 100-TB fact-fact join would take
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) =
      try {
        val j = spark.table("orders_bkt")
          .join(spark.table("lineitem_bkt"),
            $"o_orderkey" === $"l_orderkey")
          .select($"o_orderkey", $"l_quantity")
        (j, j.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // bucketed sides feed the SortMergeJoin directly: no Exchange
    // anywhere in the join plan (and no re-sort of the sorted buckets)
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"),
      s"expected a shuffle-free co-located join, got:\n$plan")

    // same rows as the unbucketed join
    val expected = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001),
        $"o_orderkey" === $"l_orderkey").count()
    assert(joined.count() == expected)
  }

  test("group-by on the bucket key reuses the bucketing: no exchange") {
    val agg = spark.table("lineitem_bkt")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected bucket-pruned aggregation, got:\n$plan")
  }
}
