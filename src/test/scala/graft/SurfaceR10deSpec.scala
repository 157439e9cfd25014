package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10de

class SurfaceR10deSpec extends SparkSpec {

  test("every R10de query runs at sf0.001") {
    SurfaceR10de.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m187: shrinkage replay matches; posterior sits between raw and prior") {
    val per = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey").cast("long").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val qps = per.map { case (_, n, x) =>
      math.floor(x.toDouble / n * 1e6 + 0.5) }
    val k = qps.length
    val m = qps.sum / k / 1e6
    val v = (qps.map(q => q * q).sum / 1e12 - k * m * m) / (k - 1)
    val c = if (v > 0 && m > 0 && m < 1) m * (1 - m) / v - 1 else 0.0
    val (alpha, beta) = if (c > 0) (m * c, (1 - m) * c) else (1.0, 1.0)
    val out = SurfaceR10de.m187BetaBinomial(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (kk, n, x) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val raw = x.toDouble / n
      val shrunk = (x + alpha) / (n + alpha + beta)
      assert(math.abs(r.getDouble(4) - shrunk) < 1e-3,
        s"supp $kk shrunk ${r.getDouble(4)} vs $shrunk")
      assert(math.abs(r.getDouble(5) - alpha) < 1e-2 ||
        math.abs(r.getDouble(5) - alpha) / alpha < 1e-3)
      val prMean = alpha / (alpha + beta)
      val lo = math.min(raw, prMean) - 1e-9
      val hi = math.max(raw, prMean) + 1e-9
      assert(r.getDouble(4) >= lo && r.getDouble(4) <= hi,
        s"supp $kk shrunk outside [raw, prior] interval")
    }
  }

  test("m188: pairwise t replay via midranks matches") {
    val days = Tables.orders(spark, sfDir)
      .select(datediff(col("o_orderdate"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0) % 7, r.getLong(1)))
    val n = days.length
    // midranks over y
    val byY = days.groupBy(_._2).view.mapValues(_.size).toSeq.sortBy(_._1)
    var below = 0L
    val mid = byY.map { case (y, c) =>
      val m0 = below + (c + 1) / 2.0; below += c; y -> m0
    }.toMap
    val rj = days.groupBy(_._1).view.mapValues(g =>
      (g.size.toLong, g.map(x => mid(x._2)).sum)).toMap
    val sr2 = days.map(x => mid(x._2) * mid(x._2)).sum
    val s2 = (sr2 - n.toDouble * (n + 1) * (n + 1) / 4) / (n - 1)
    val tstat = rj.values.map { case (nj, r0) => r0 * r0 / nj }.sum
    val hT = (tstat - n.toDouble * (n + 1) * (n + 1) / 4) / s2
    val out = SurfaceR10de.m188ConoverIman(spark, sfDir).collect()
    assert(out.length == 21)
    out.foreach { r =>
      val (di, dj) = (r.getLong(0), r.getLong(1))
      val (ni, r2i) = rj(di); val (nj, r2j) = rj(dj)
      val expect = (r2i / ni - r2j / nj) /
        math.sqrt(s2 * (n - 1 - hT) / (n - 7) * (1.0 / ni + 1.0 / nj))
      assert(math.abs(r.getDouble(6) - expect) < 1e-3,
        s"pair ($di,$dj) t ${r.getDouble(6)} vs $expect")
    }
  }
}
