package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ao

class SurfaceR10aoSpec extends SparkSpec {

  private def weekly(): Array[(Long, Long)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(expr(
        "CAST(floor(CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT) / 7.0) AS BIGINT)")
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  test("every R10ao query runs at sf0.001") {
    SurfaceR10ao.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m122: slope is the median of pairwise slopes (brute recompute)") {
    val wk = weekly()
    val slopes = (for {
      i <- wk.indices; j <- (i + 1) until wk.length
    } yield (wk(j)._2 - wk(i)._2).toDouble / (wk(j)._1 - wk(i)._1)).sorted
    def med(v: Seq[Double]) = {
      val h = (v.length - 1) / 2.0
      val lo = v(h.toInt); val hi = v(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    val r = SurfaceR10ao.m122TheilSen(spark, sfDir).collect().head
    assert(r.getLong(0) == wk.length)
    assert(r.getLong(1) == slopes.length)
    assert(math.abs(r.getDouble(2) - med(slopes)) < 1e-3,
      s"slope ${r.getDouble(2)} vs ${med(slopes)}")
  }

  test("m123: S and tie-corrected Z match a brute recompute") {
    val wk = weekly()
    val sStat = (for {
      i <- wk.indices; j <- (i + 1) until wk.length
    } yield math.signum((wk(j)._2 - wk(i)._2).toDouble).toLong).sum
    val n = wk.length.toDouble
    val tieTerm = wk.groupBy(_._2).values.map(_.size.toDouble)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val v = (n * (n - 1) * (2 * n + 5) - tieTerm) / 18.0
    val z =
      if (sStat > 0) (sStat - 1) / math.sqrt(v)
      else if (sStat < 0) (sStat + 1) / math.sqrt(v)
      else 0.0
    val r = SurfaceR10ao.m123MannKendall(spark, sfDir).collect().head
    assert(r.getLong(0) == wk.length)
    assert(r.getLong(1) == sStat, s"S ${r.getLong(1)} vs $sStat")
    assert(math.abs(r.getDouble(2) - z) < 1e-3, s"Z ${r.getDouble(2)} vs $z")
  }
}
