package graft

import graft.queries.SurfaceR10cj

class SurfaceR10cjSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("every R10cj query runs at sf0.001") {
    SurfaceR10cj.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("q44: the three effects bridge the revenue delta exactly") {
    val rows = SurfaceR10cj.q44PriceVolumeBridge(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val delta = r.getDouble(5)
      val sum = r.getDouble(6) + r.getDouble(7) + r.getDouble(8)
      // identity Δrev = vol + price + cross, up to the 1e-4 rounding of
      // the four published terms
      assert(math.abs(delta - sum) < 4e-4, s"${r.getString(0)}: $delta vs $sum")
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
  }

  test("a40: KMV estimate matches an md5 replay and lands near the exact NDV") {
    import org.apache.spark.sql.functions._
    val vals = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("v"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = vals.groupBy(_._1).map { case (f, vs) =>
      val hashes = vs.map(v => md5hex(v._2.toString)).sorted
      val ndv = vs.length.toLong
      val est =
        if (hashes.length < 64) ndv.toDouble
        else {
          val hk = hashes(63).take(8).foldLeft(0L)((acc, c) =>
            acc * 16 + "0123456789abcdef".indexOf(c))
          63.0 * 4294967296.0 / hk
        }
      f -> (ndv, math.floor(est * 1e4 + 0.5) / 1e4)
    }
    val rows = SurfaceR10cj.a40KmvNdv(spark, sfDir).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (ndv, est) = expected(r.getString(0))
      assert(r.getLong(1) == ndv)
      assert(math.abs(r.getDouble(2) - est) < 1e-9, s"${r.getString(0)} est")
      // KMV with k=64 has ~1/sqrt(62) relative error; allow a loose bound.
      if (ndv >= 64) assert(r.getDouble(3) < 0.5, s"${r.getString(0)} err")
    }
  }
}
