package graft

import graft.queries.SurfaceR10cr

class SurfaceR10crSpec extends SparkSpec {

  private def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("every R10cr query runs at sf0.001") {
    SurfaceR10cr.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m176: F matches a driver replay and the nesting law holds") {
    import org.apache.spark.sql.functions._
    val wide = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("day").pivot("event_type", Seq("click", "purchase"))
      .count().na.fill(0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val byDay = wide.map(w => w._1 -> (w._2, w._3)).toMap
    val pairs = wide.flatMap { case (day, _, _) =>
      byDay.get(day - 1).map { case (cl, pl) =>
        val (c0, p0) = byDay(day); (p0, pl, cl, c0)
      }
    }
    def f(y: Seq[Long], ylag: Seq[Long], xlag: Seq[Long]): (Double, Double) = {
      val n = y.length.toDouble
      def c(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (u, v) => u.toDouble * v }.sum - a.sum * b.sum / n
      val (c11, c22, c12) = (c(ylag, ylag), c(xlag, xlag), c(ylag, xlag))
      val (c1y, c2y, cyy) = (c(ylag, y), c(xlag, y), c(y, y))
      val sseR = cyy - c1y * c1y / c11
      val det = c11 * c22 - c12 * c12
      val b1 = (c22 * c1y - c12 * c2y) / det
      val b2 = (c11 * c2y - c12 * c1y) / det
      val sseU = cyy - b1 * c1y - b2 * c2y
      (((sseR - sseU) / 1.0) / (sseU / (n - 3)), sseR - sseU)
    }
    val (fCp, gain) = f(pairs.map(_._1).toSeq, pairs.map(_._2).toSeq,
      pairs.map(_._3).toSeq)
    assert(gain >= -1e-6, "restricted SSE must dominate unrestricted")
    val rows = SurfaceR10cr.m176Granger(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows.size == 2)
    assert(math.abs(rows("click->purchase") - r4d(fCp)) < 1e-9,
      s"${rows("click->purchase")} vs $fCp")
    assert(rows.values.forall(v => !v.isNaN && v >= 0.0))
  }

  test("ls7: greedy replay matches; later steps trade relevance for diversity") {
    import org.apache.spark.sql.functions._
    val rows = SurfaceR10cr.ls7Mmr(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == 3)
    // distinct picks
    assert(rows.map(_.getLong(1)).distinct.length == 3)
    // step 1 is pure relevance: score = 0.7 * rel exactly (post-r4)
    assert(math.abs(rows(0).getDouble(3) -
      r4d(0.7 * rows(0).getDouble(2))) < 2e-4)
    // steps 2-3 pay a nonnegative redundancy penalty
    rows.drop(1).foreach { r =>
      assert(r.getDouble(3) <= 0.7 * r.getDouble(2) + 1e-9,
        s"step ${r.getLong(0)}")
    }
    // scores are non-increasing down the greedy sequence only when the
    // pool is redundancy-dominated; assert the weaker sane bound: all
    // scores are finite and below the step-1 score + epsilon
    assert(rows.forall(r => !r.getDouble(3).isNaN))
    assert(rows.drop(1).forall(_.getDouble(3) <= rows(0).getDouble(3) + 1e-9))
  }
}
