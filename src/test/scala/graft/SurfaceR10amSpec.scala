package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10am

class SurfaceR10amSpec extends SparkSpec {

  test("every R10am query runs at sf0.001") {
    SurfaceR10am.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m118: JB matches a driver-side recompute from raw values") {
    val xs = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(o_totalprice / 1000.0) AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    SurfaceR10am.m118JarqueBera(spark, sfDir).collect().foreach { r =>
      val v = xs(r.getString(0))
      val n = v.length.toDouble
      val mean = v.sum / n
      def mom(p: Int) = v.map(x => math.pow(x - mean, p)).sum / n
      val g1 = mom(3) / math.pow(mom(2), 1.5)
      val g2 = mom(4) / (mom(2) * mom(2))
      val jb = n / 6.0 * (g1 * g1 + (g2 - 3) * (g2 - 3) / 4.0)
      assert(r.getLong(1) == v.length)
      assert(math.abs(r.getDouble(2) - g1) < 1e-3, s"skew ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - (g2 - 3)) < 1e-3, s"kurt ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - jb) < math.abs(jb) * 1e-3 + 1e-3,
        s"jb ${r.getString(0)}: got ${r.getDouble(4)} want $jb")
    }
  }

  test("m119: grubbs G matches the naive max-deviation recompute") {
    val xs = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT)")
          .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    SurfaceR10am.m119Grubbs(spark, sfDir).collect().foreach { r =>
      val v = xs(r.getString(0))
      val n = v.length.toDouble
      val mean = v.sum / n
      val sd = math.sqrt(v.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      val maxDev = v.map(x => math.abs(x - mean)).max
      assert(math.abs(r.getDouble(2) - maxDev) < 1e-2, s"maxdev ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - maxDev / sd) < 1e-3, s"G ${r.getString(0)}")
      assert(r.getDouble(3) > 1.0 && r.getDouble(3) < 100.0, "G out of plausible range")
    }
  }

  test("m120: W is nonnegative and the scale-invariance the doubling relies on holds") {
    val r = SurfaceR10am.m120LeveneBf(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 5, "expected 5 priority groups")
    assert(row.getDouble(2) >= 0.0, s"W ${row.getDouble(2)} negative")
    // driver-side recompute on the half-dollar z values
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT)")
          .as("x"))
      .collect().map(rr => (rr.getString(0), rr.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def med2(v: Seq[Long]): Double = {
      val s = v.map(_ * 2).sorted
      val h = (s.length - 1) / 2.0
      val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    val z = rows.map { case (g, v) =>
      val m = med2(v.toSeq)
      g -> v.map(x => math.abs(2 * x - m))
    }
    val all = z.values.flatten
    val zbar = all.sum / all.size
    val k = z.size.toDouble; val bigN = all.size.toDouble
    val between = z.values.map { v =>
      val m = v.sum / v.size; v.size * (m - zbar) * (m - zbar)
    }.sum
    val within = z.values.map { v =>
      val m = v.sum / v.size; v.map(x => (x - m) * (x - m)).sum
    }.sum
    val w = ((bigN - k) / (k - 1)) * between / within
    assert(math.abs(row.getDouble(2) - w) < math.abs(w) * 1e-3 + 1e-3,
      s"W ${row.getDouble(2)} vs recompute $w")
  }
}
