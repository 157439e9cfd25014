package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR11d

class SurfaceR11dSpec extends SparkSpec {

  test("every R11d query runs at sf0.001") {
    SurfaceR11d.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt71: components re-add to the observation within the r4 grid") {
    val rows = SurfaceR11d.queries("lt71_stl_decompose")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("v")
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      // each component is independently rounded to 1e-4, so the re-add
      // can be off by at most a few grid steps
      assert(math.abs(v - sum) < 5e-4, s"decomposition broke: $r")
    }
  }

  test("lt71: residuals average to ~zero per event type") {
    // seasonal(dow) is the mean of detr within its (type, dow) group,
    // so residuals cancel within every group by construction — their
    // per-type mean must sit at zero up to the r4 rounding of each term
    val bad = SurfaceR11d.queries("lt71_stl_decompose")(spark, sfDir)
      .groupBy("event_type").agg(avg("residual").as("mr"))
      .where(abs(col("mr")) > 1e-3).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("m203: the blend formula reproduces the fitted model bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.ml.feature.TargetEncoder
    val df = Seq(("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 0.0), ("b", 1.0),
        ("c", 1.0)).toDF("cat", "y")
      .withColumn("ci", when(col("cat") === "a", 0.0)
        .when(col("cat") === "b", 1.0).otherwise(2.0))
    val te = new TargetEncoder().setInputCols(Array("ci"))
      .setOutputCols(Array("enc")).setLabelCol("y")
      .setTargetType("binary").setSmoothing(10.0)
    val got = te.fit(df).transform(df).select("cat", "enc").distinct()
      .as[(String, Double)].collect().toMap
    def blend(n: Double, cm: Double, gm: Double): Double =
      (n / (n + 10.0)) * cm + (1 - n / (n + 10.0)) * gm
    // EXACT equality on purpose: the m203 oracle recomputes this text
    assert(got("a") == blend(3, 2.0 / 3, 4.0 / 6))
    assert(got("b") == blend(2, 1.0 / 2, 4.0 / 6))
    assert(got("c") == blend(1, 1.0 / 1, 4.0 / 6))
  }

  test("lt71: full-window edge rule drops exactly 6 rows per type") {
    val out = SurfaceR11d.queries("lt71_stl_decompose")(spark, sfDir)
    val perType = out.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDays = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day")).count()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perType.foreach { case (et, n) =>
      assert(n == nDays(et) - 6, s"$et: $n vs ${nDays(et)} days")
    }
  }
}
