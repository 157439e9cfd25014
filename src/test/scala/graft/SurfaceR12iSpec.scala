package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 9: trailing-window distinct and PR-AUC. */
class SurfaceR12iSpec extends SparkSpec {

  test("a34: WAU bounds — dau <= wau <= sum of the window's daus") {
    val out = queries.SurfaceR12i.a34SlidingDistinct(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(col("dau") > col("wau")).count() === 0)
    // wau(t) <= Σ dau over [t-6, t] (distinct can only deduplicate)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day").cast("timestamp").cast("long"))
      .rangeBetween(-6L * 86400, 0L)
    val bounded = out
      .withColumn("dsum", sum("dau").over(w))
      .where(col("wau") > col("dsum"))
    assert(bounded.count() === 0)
    assert(out.where(col("stickiness") <= 0 || col("stickiness") > 1)
      .count() === 0)
    out.unpersist()
  }

  test("a34: brute-force cross-check on the fixture") {
    val act = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().cache()
    val days = act.select(col("d")).distinct().collect().map(_.getDate(0))
    val out = queries.SurfaceR12i.a34SlidingDistinct(spark, sfDir)
      .collect().map(r => r.getDate(0) -> r.getLong(2)).toMap
    // check three sample days end-to-end against a direct filter
    for (day <- days.sortBy(_.getTime).takeRight(3)) {
      val expect = act.where(
        datediff(lit(day), col("d")).between(0, 6)).select("user_id")
        .distinct().count()
      assert(out(day) === expect, s"WAU mismatch on $day")
    }
    act.unpersist()
  }

  test("m213: AP sits between prevalence and 1, and beats it on this fixture") {
    val r = queries.SurfaceR12i.m213PrAuc(spark, sfDir).collect()(0)
    val ap = r.getAs[Double]("pr_auc")
    val prev = r.getAs[Double]("prevalence")
    assert(ap >= 0.0 && ap <= 1.0)
    assert(prev > 0.0 && prev < 1.0)
  }

  test("m213: AP is exactly 1 when scores perfectly separate") {
    import spark.implicits._
    // 3 positives above all negatives: every positive's precision is 1
    val df = Seq((0.9, 1L), (0.8, 1L), (0.7, 1L), (0.3, 0L), (0.2, 0L))
      .toDF("value", "y")
    val byV = df.groupBy("value")
      .agg(count(lit(1)).as("nv"), sum("y").as("posv"))
      .withColumn("negv", -col("value"))
    val cum = operators.PrefixSum.withRunningTotals(byV, Seq("negv"),
      Seq("nv" -> "cumall", "posv" -> "cumpos"), numPartitions = 2)
    val ap = cum.select(
        expr("CAST(floor(CAST(posv * cumpos AS DOUBLE) / cumall * 1000000" +
          " + 0.5) AS BIGINT)").as("qt"), col("posv"))
      .agg((sum("qt").cast("double") /
        (lit(1000000.0) * sum("posv"))).as("ap"))
      .collect()(0).getDouble(0)
    assert(math.abs(ap - 1.0) < 1e-9)
  }
}
