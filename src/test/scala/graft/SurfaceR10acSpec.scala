package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ac

class SurfaceR10acSpec extends SparkSpec {

  test("every R10ac query runs at sf0.001") {
    SurfaceR10ac.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m103: backtest errors match a driver-side Holt walk-forward") {
    val rows = SurfaceR10ac.m103ForecastBacktest(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val series = daily(r.getString(0)).sortBy(_._2).map(_._3)
      var l = series.head; var t = 0.0
      var mae = 0.0; var mpe = 0.0
      series.tail.foreach { v =>
        val f = l + t
        mae += math.abs(v - f)
        mpe += math.abs(1.0 - f / v)
        val l2 = 0.5 * v + 0.5 * (l + t)
        t = 0.15 * v - 0.15 * l + 0.85 * t
        l = l2
      }
      val n = series.length - 1
      assert(math.abs(r.getDouble(2) - mae / n) < 1e-3,
        s"${r.getString(0)} mae ${r.getDouble(2)} vs ${mae / n}")
      assert(math.abs(r.getDouble(3) - mpe / n) < 1e-3,
        s"${r.getString(0)} mape ${r.getDouble(3)} vs ${mpe / n}")
    }
  }

  test("lp47: chunk stats reconcile; boundaries are content-defined") {
    val rows = SurfaceR10ac.lp47CdcChunking(spark, sfDir).collect()
    val tokCounts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == tokCounts(r.getLong(0)),
        "chunk token sum != doc token count")
      assert(r.getLong(3) <= r.getLong(2))
      assert(math.abs(r.getDouble(4) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-3)
    }
    // expected chunk length ~ 8 tokens corpus-wide (p(boundary)=1/8)
    val meanLen = rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum
    assert(meanLen > 4.0 && meanLen < 16.0, s"implausible mean chunk $meanLen")
  }
}
