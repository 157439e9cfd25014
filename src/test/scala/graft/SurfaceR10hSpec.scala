package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10h

class SurfaceR10hSpec extends SparkSpec {

  test("every R10h query runs at sf0.001") {
    SurfaceR10h.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("w13: running distinct equals a brute-force driver recompute") {
    val out = SurfaceR10h.w13DistinctWindow(spark, sfDir)
      .where(col("l_suppkey") < 3).collect()
      .map(r => (r.getLong(0), r.get(1).toString) -> r.getLong(2)).toMap
    val rows = Tables.lineitem(spark, sfDir)
      .where(col("l_suppkey") < 3)
      .select("l_suppkey", "l_partkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString))
    rows.groupBy(_._1).foreach { case (supp, ls) =>
      val dates = ls.map(_._3).distinct.sorted
      dates.foreach { dt =>
        val expect = ls.filter(_._3 <= dt).map(_._2).distinct.size.toLong
        assert(out((supp, dt)) == expect, s"supp=$supp dt=$dt")
      }
    }
  }

  test("w13: the final row per key equals the total distinct count") {
    val last = SurfaceR10h.w13DistinctWindow(spark, sfDir)
      .groupBy("l_suppkey").agg(max("distinct_parts").as("dp"))
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_suppkey").agg(countDistinct("l_partkey").as("dp"))
    assert(last.join(exact, "l_suppkey")
      .where(last("dp") =!= exact("dp")).count() == 0)
  }

  test("l16: smoothed bigram probs are valid and repeated text scores higher") {
    val out = SurfaceR10h.l16BigramLm(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) < 0.0, "log-prob must be negative")
    }
    // every bigram prob <= (c12+1)/(c1+V) <= 1 by construction; the
    // corpus-average must sit in a sane band, not at -inf
    assert(out.map(_.getDouble(2)).min > -25.0)
  }

  test("lt18: entropy bounds — 0 <= H <= ln(types); uniform doc hits ln(m)") {
    val rows = SurfaceR10h.lt18TokenEntropy(spark, sfDir).collect()
    rows.foreach { r =>
      val types = r.getLong(2)
      val h = r.getDouble(3)
      assert(h >= -1e-9, s"doc ${r.getLong(0)} negative entropy")
      assert(h <= math.log(types.toDouble) + 1e-4,
        s"doc ${r.getLong(0)} entropy above ln(types)")
      val ttr = r.getDouble(4)
      assert(ttr > 0 && ttr <= 1.0)
    }
  }

  test("lt19: zipf slope is negative and the fit is over the top-1000") {
    val r = SurfaceR10h.lt19ZipfFit(spark, sfDir).collect().head
    assert(r.getLong(0) <= 1000)
    assert(r.getDouble(1) < 0.0, s"zipf slope ${r.getDouble(1)} not negative")
  }
}
