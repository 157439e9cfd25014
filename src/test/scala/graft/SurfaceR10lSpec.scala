package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10l

class SurfaceR10lSpec extends SparkSpec {

  test("every R10l query runs at sf0.001") {
    SurfaceR10l.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("q41: segments partition the customer base, all segs in 1..4") {
    val segs = SurfaceR10l.q41Rfm(spark, sfDir).collect()
    val nCust = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(segs.map(_.getLong(3)).sum == nCust)
    segs.foreach { r =>
      (0 to 2).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 4))
    }
    // quartile thresholds put roughly a quarter of customers in each
    // marginal recency band (exact quarters up to ties)
    val byR = segs.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(3)).sum)
    assert(byR.size == 4)
    byR.values.foreach(n =>
      assert(math.abs(n - nCust / 4.0) <= nCust * 0.15,
        s"marginal recency band far from a quarter: $n of $nCust"))
  }

  test("m76: kappa matches a driver-side recompute from raw labels") {
    val row = SurfaceR10l.m76CohenKappa(spark, sfDir).collect().head
    val raw = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("a"),
        (col("o_totalprice") > 150000.0).as("b"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val n = raw.length.toDouble
    val po = raw.count(t => t._1 == t._2) / n
    val pa = raw.count(_._1) / n
    val pb = raw.count(_._2) / n
    val pe = pa * pb + (1 - pa) * (1 - pb)
    val kappa = (po - pe) / (1 - pe)
    assert(math.abs(row.getDouble(4) - po) < 1e-3)
    assert(math.abs(row.getDouble(6) - kappa) < 1e-3)
    assert(row.getLong(0) == raw.length)
  }

  test("m77: chi2 nonneg, V in [0,1], dof matches category counts") {
    val row = SurfaceR10l.m77CramersV(spark, sfDir).collect().head
    val li = Tables.lineitem(spark, sfDir)
    val r = li.select("l_returnflag").distinct().count()
    val c = li.select("l_linestatus").distinct().count()
    assert(row.getLong(1) == (r - 1) * (c - 1))
    assert(row.getDouble(2) >= 0.0)
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  test("m78: MI bounds — 0 <= MI <= min(H(X), H(Y)), NMI in [0,1]") {
    val row = SurfaceR10l.m78MutualInfo(spark, sfDir).collect().head
    val (mi, hx, hy, nmi) =
      (row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(mi >= -1e-9)
    assert(mi <= math.min(hx, hy) + 1e-9)
    assert(hx > 0 && hy > 0)
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
  }

  test("a34: moments match a driver-side recompute over raw quantities") {
    val rows = SurfaceR10l.a34SkewKurt(spark, sfDir).collect()
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val qs = raw(r.getString(0)).map(_._2.toDouble)
      val n = qs.length.toDouble
      val mu = qs.sum / n
      val m2 = qs.map(q => (q - mu) * (q - mu)).sum / n
      val m3 = qs.map(q => math.pow(q - mu, 3)).sum / n
      val m4 = qs.map(q => math.pow(q - mu, 4)).sum / n
      assert(r.getLong(1) == qs.length)
      assert(math.abs(r.getDouble(2) - mu) < 1e-3)
      assert(math.abs(r.getDouble(4) - m3 / math.pow(m2, 1.5)) < 1e-3)
      assert(math.abs(r.getDouble(5) - (m4 / (m2 * m2) - 3.0)) < 1e-3)
    }
  }
}
