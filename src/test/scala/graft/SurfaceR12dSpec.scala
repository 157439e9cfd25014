package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 4: the seasonal-naive backtest and split
  * conformal prediction. */
class SurfaceR12dSpec extends SparkSpec {

  test("lt81: MASE and sMAPE are non-negative; sMAPE is bounded by 200") {
    val out = queries.SurfaceR12d.lt81MaseBacktest(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(col("mase") < 0).count() === 0)
    assert(out.where(col("smape") < 0 || col("smape") > 200).count() === 0)
    out.unpersist()
  }

  test("lt81: a perfectly seasonal series scores MASE 0") {
    import spark.implicits._
    // period-7 series, 14 days: the seasonal naive is exact on the
    // held-out tail, so sum_err = 0 => MASE = 0 by the operator's
    // formula (replicated here at the formula level)
    val qv = (1 to 14).map(j => (j.toLong, (j % 7).toLong * 1000000L))
    val idx = qv.toDF("j", "qv")
    val err = idx.as("t").join(idx.as("f"), expr("f.j = t.j - 7"))
      .where(col("t.j") > 14 - 3)
      .agg(sum(abs(col("t.qv") - col("f.qv")))).collect()(0).getLong(0)
    assert(err === 0L)
  }

  test("m210: conformal coverage lands near the nominal 90%") {
    val out = queries.SurfaceR12d.m210ConformalOls(spark, sfDir).cache()
    assert(out.count() > 0)
    // the marginal guarantee is >= 1 - alpha in expectation over
    // exchangeable splits; on a fixed deterministic split allow slack
    val agg = out.agg(
      sum(col("coverage") * col("n_test")).as("covn"),
      sum("n_test").as("n")).collect()(0)
    val pooled = agg.getDouble(0) / agg.getLong(1)
    assert(pooled >= 0.85 && pooled <= 1.0,
      s"pooled conformal coverage $pooled strayed from nominal 0.9")
    // intervals have one global width (the conformal half-width is a
    // single order statistic)
    assert(out.select("width").distinct().count() === 1)
    out.unpersist()
  }

  test("m210: the order statistic matches a driver-side sort (small-N cross-check)") {
    // replicate the k-th smallest |r| selection on the calibration set
    // with a plain collect+sort and compare to the PrefixSum route's
    // reported width (width = 2*qr/1e6)
    val base = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"),
      col("l_quantity").cast("long").as("x"),
      expr("CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT)").as("y2"))
    val tr = base.where(col("l_orderkey") % 2 === 0)
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y2").as("sy"),
        sum(col("x") * col("y2")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .collect()(0)
    val (n, sx, sy, sxy, sxx) = (tr.getLong(0), tr.getLong(1), tr.getLong(2),
      tr.getLong(3), tr.getLong(4))
    val b = (BigInt(n) * BigInt(sxy) - BigInt(sx) * BigInt(sy)).toDouble /
      (BigInt(n) * BigInt(sxx) - BigInt(sx) * BigInt(sx)).toDouble
    val qb = math.floor(b * 10000 + 0.5).toLong
    val qa = math.floor((sy * 10000L - qb * sx).toDouble / n + 0.5).toLong
    val rs = base.where(col("l_orderkey") % 4 === 1)
      .select((abs(col("y2") * 10000L - (lit(qa) + lit(qb) * col("x")))).as("r"))
      .collect().map(_.getLong(0)).sorted
    val k = (((rs.length + 1) * 9 + 9) / 10) - 1 // 0-based index
    val expectedWidth = 2.0 * rs(k) / 1000000.0
    val got = queries.SurfaceR12d.m210ConformalOls(spark, sfDir)
      .select("width").distinct().collect()(0).getDouble(0)
    assert(math.abs(got - math.floor(expectedWidth * 1e4 + 0.5) / 1e4) < 1e-9)
  }
}
