package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10aw

class SurfaceR10awSpec extends SparkSpec {

  test("every R10aw query runs at sf0.001") {
    SurfaceR10aw.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("q42: coverage matches a driver-side sweep and is bounded by the span") {
    val ivs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_suppkey"),
        expr("CAST(floor(unix_timestamp(l_shipdate)) AS BIGINT)").as("s0"),
        (expr("CAST(floor(unix_timestamp(l_shipdate)) AS BIGINT)") +
          (lit(1) + col("l_partkey") % 21) * 86400L).as("e0"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val rows = SurfaceR10aw.q42IntervalCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { r =>
      val sup = r.getLong(0)
      val sorted = ivs(sup).map(t => (t._2, t._3)).sortBy(identity)
      // naive union-length sweep
      var covered = 0L; var curS = -1L; var curE = -1L
      sorted.foreach { case (s0, e0) =>
        if (curE < 0 || s0 > curE) {
          if (curE >= 0) covered += curE - curS
          curS = s0; curE = e0
        } else if (e0 > curE) curE = e0
      }
      if (curE >= 0) covered += curE - curS
      assert(r.getLong(2) == covered, s"coverage for supplier $sup")
      assert(r.getLong(2) <= r.getLong(3), s"coverage > span for $sup")
      assert(r.getLong(1) == sorted.length)
    }
  }

  test("lp59: systematic PPS draws exactly 50 odd-multiple hits and respects weights") {
    val rows = SurfaceR10aw.lp59SystematicPps(spark, sfDir).collect()
    val totalHits = rows.map(_.getLong(3)).sum
    assert(totalHits == 50, s"expected 50 systematic hits, got $totalHits")
    assert(rows.forall(_.getLong(3) >= 1))
    // reproducibility
    val rows2 = SurfaceR10aw.lp59SystematicPps(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == rows2.map(_.toSeq).toSeq,
      "PPS sample not reproducible")
    // driver-side recompute of the inclusion predicate
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sTot = docs.map(_._2).sum
    def f(x: Long): Long =
      math.floor((100.0 * x + sTot) / (2.0 * sTot)).toLong
    var cum = 0L
    val expect = docs.flatMap { case (id, w) =>
      cum += w
      val h = f(cum) - f(cum - w)
      if (h > 0) Some((id, h)) else None
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(3))).toSeq == expect.toSeq,
      "selected set differs from the driver recompute")
  }
}
