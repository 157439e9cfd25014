package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {

  test("matching bucketed tables join without a shuffle exchange") {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
      "ord_bucketed", "o_orderkey", buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = Bucketing.bucketedJoin(
        spark, "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
      joined.count() // finalise AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // correctness: same result as the plain join
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("bucketedJoin handles the same-named key on both sides (fact-fact case)") {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("okey"), col("l_quantity")),
      "lq_bucketed", "okey", buckets = 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("okey"), col("o_orderpriority")),
      "op_bucketed", "okey", buckets = 4)
    try {
      val joined = Bucketing.bucketedJoin(
        spark, "lq_bucketed", "op_bucketed", "okey", "okey")
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lq_bucketed")
      spark.sql("DROP TABLE IF EXISTS op_bucketed")
    }
  }
}
