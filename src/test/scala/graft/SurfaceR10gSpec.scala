package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10g

class SurfaceR10gSpec extends SparkSpec {

  test("every R10g query runs at sf0.001") {
    SurfaceR10g.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("s21: bucketed-join aggregate equals the plain-join recompute") {
    val out = SurfaceR10g.s21BucketedJoin(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exp = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sq"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    exp.foreach { case (k, (n, sq)) =>
      assert(out(k)._1 == n, s"$k count")
      assert(math.abs(out(k)._2 - math.floor(sq * 1e4 + 0.5) / 1e4) < 1e-9)
    }
  }

  test("s21: the bucket-local join itself plans without an exchange") {
    // tables were just written by the registry entry above; force SMJ and
    // verify the join subtree is exchange-free (bucket metadata honored)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      SurfaceR10g.s21BucketedJoin(spark, sfDir).count()
      val j = graft.operators.Bucketing.bucketedJoin(
        spark, "graft_s21_orders", "graft_s21_lineitem",
        "o_orderkey", "l_orderkey")
      j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("lp31: each z-bucket bounds BOTH dimensions (the skipping law)") {
    val rows = SurfaceR10g.lp31Zorder(spark, sfDir).collect()
    assert(rows.length > 1, "expected multiple z buckets")
    // bucket = top-8 interleaved bits = top-4 bits of each dim: a bucket
    // spans at most 1/16 of each dimension's 256-cell range, so raw
    // min/max spreads are bounded by ceil(range/16) per dimension.
    val ckRange = rows.map(_.getLong(3)).max - rows.map(_.getLong(2)).min
    val dayRange = rows.map(_.getLong(5)).max - rows.map(_.getLong(4)).min
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= ckRange / 16 + ckRange / 256 + 2,
        s"bucket ${r.getLong(0)} custkey spread too wide")
      assert(r.getLong(5) - r.getLong(4) <= dayRange / 16 + dayRange / 256 + 2,
        s"bucket ${r.getLong(0)} day spread too wide")
    }
    // total row count conserved
    assert(rows.map(_.getLong(1)).sum ==
      Tables.orders(spark, sfDir).count())
  }

  test("lp32: merged partial states equal the full recompute") {
    val out = SurfaceR10g.lp32IncrAgg(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4), r.getDouble(5)))
      .toMap
    val full = Tables.orders(spark, sfDir)
      .withColumn("pi", expr("CAST(round(o_totalprice * 10000) AS BIGINT)"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum("pi").as("t"),
        min("pi").as("lo"), max("pi").as("hi"))
      .collect()
    assert(full.length == out.size)
    full.foreach { r =>
      val (n, t, lo, hi) = out(r.getLong(0))
      assert(n == r.getLong(1))
      // exact integer-cents algebra: merge == recompute bit-for-bit
      assert(t == math.floor(r.getLong(2) / 10000.0 * 1e4 + 0.5) / 1e4)
      assert(lo == math.floor(r.getLong(3) / 10000.0 * 1e4 + 0.5) / 1e4)
      assert(hi == math.floor(r.getLong(4) / 10000.0 * 1e4 + 0.5) / 1e4)
    }
  }
}
