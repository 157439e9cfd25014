package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 5: Huber IRLS and the Hampel filter. */
class SurfaceR12eSpec extends SparkSpec {

  test("m209: Huber's mean absolute residual does not exceed plain OLS's") {
    // robustness direction: reweighting minimizes a loss closer to L1,
    // so mean |resid| under the Huber fit must be <= the OLS fit's
    // (global, since both lines are global)
    val huber = queries.SurfaceR12e.m209HuberIrls(spark, sfDir)
      .agg(sum(col("mean_abs_resid") * col("n")).as("s"), sum("n").as("n"))
      .collect()(0)
    val huberMar = huber.getDouble(0) / huber.getLong(1)
    // OLS reference from the m210 machinery at the same quantization
    val base = Tables.lineitem(spark, sfDir).select(
      col("l_quantity").cast("long").as("x"),
      expr("CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT)").as("y2"))
    val m = base.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y2").as("sy"), sum(col("x") * col("y2")).as("sxy"),
      sum(col("x") * col("x")).as("sxx")).collect()(0)
    val (n, sx, sy, sxy, sxx) =
      (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
    val b = (BigInt(n) * BigInt(sxy) - BigInt(sx) * BigInt(sy)).toDouble /
      (BigInt(n) * BigInt(sxx) - BigInt(sx) * BigInt(sx)).toDouble
    val qb = math.floor(b * 10000 + 0.5).toLong
    val qa = math.floor((sy * 10000L - qb * sx).toDouble / n + 0.5).toLong
    val olsMar = base
      .select(abs(col("y2") * 10000L - (lit(qa) + lit(qb) * col("x"))).as("a"))
      .agg(sum("a")).collect()(0).getLong(0).toDouble / (n * 1000000.0)
    assert(huberMar <= olsMar + 1e-6,
      s"Huber MAR $huberMar worse than OLS MAR $olsMar")
  }

  test("m209: weights only act beyond the delta threshold") {
    val out = queries.SurfaceR12e.m209HuberIrls(spark, sfDir)
    assert(out.where(col("frac_downweighted") < 0 ||
      col("frac_downweighted") > 1).count() === 0)
    // slope/intercept constant across groups (one global line)
    assert(out.select("slope", "intercept").distinct().count() === 1)
  }

  test("lt82: cleaned equals value exactly on non-outliers, median on outliers") {
    val out = queries.SurfaceR12e.lt82Hampel(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(!col("is_outlier") &&
      col("cleaned") =!= col("value")).count() === 0)
    assert(out.where(col("is_outlier") &&
      col("cleaned") =!= col("window_median")).count() === 0)
    out.unpersist()
  }

  test("lt82: a manufactured spike is flagged and a flat series is not") {
    import spark.implicits._
    // replicate the doubled-median test on hand arrays
    def flags(xs: Seq[Long]): Seq[Boolean] = {
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("j", "qv")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("j").rowsBetween(-3, 3)
      // single tiny series: the unpartitioned window is test-only
      df.withColumn("arr", sort_array(collect_list(col("qv")).over(w)))
        .withColumn("nw", size(col("arr")).cast("long"))
        .withColumn("dmed", expr(
          "element_at(arr, CAST((nw + 1) div 2 AS INT))" +
            " + element_at(arr, CAST((nw + 2) div 2 AS INT))"))
        .withColumn("dv", expr("sort_array(transform(arr, e -> abs(2 * e - dmed)))"))
        .withColumn("dmad", expr(
          "element_at(dv, CAST((nw + 1) div 2 AS INT))" +
            " + element_at(dv, CAST((nw + 2) div 2 AS INT))"))
        .withColumn("f", expr("2 * abs(2 * qv - dmed) > 3 * dmad"))
        .orderBy("j").collect().map(_.getAs[Boolean]("f")).toSeq
    }
    val spiky = flags(Seq(10L, 11L, 10L, 900L, 11L, 10L, 11L, 10L))
    assert(spiky(3), "spike not flagged")
    assert(spiky.count(identity) === 1, "only the spike should flag")
    val flat = flags(Seq.fill(8)(42L))
    assert(!flat.exists(identity), "flat series must not flag")
  }
}
