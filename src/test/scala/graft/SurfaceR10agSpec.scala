package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ag

class SurfaceR10agSpec extends SparkSpec {

  test("every R10ag query runs at sf0.001") {
    SurfaceR10ag.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("w14: growth index telescopes to cents ratio vs the first day") {
    val rows = SurfaceR10ag.w14Cumprod(spark, sfDir).collect()
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_shipdate").cast("date").as("day"))
      .agg(floor(sum(col("l_extendedprice")) * 100 + lit(0.5)).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    rows.groupBy(_.getString(0)).foreach { case (flag, g) =>
      val sorted = g.sortBy(_.getDate(1).toString)
      val series = daily(flag).sortBy(_._2).map(_._3)
      // exp(sum(ln(c_k/c_{k-1}))) telescopes to c_last / c_first up to
      // float error ~1e-12 — NOT the product of the r4-rounded ratios,
      // whose per-step rounding compounds
      val expect = series.last.toDouble / series.head
      val last = sorted.last.getDouble(3)
      assert(math.abs(last - expect) / expect < 1e-3,
        s"$flag: index $last vs telescoped $expect")
      sorted.foreach(r => assert(r.getDouble(3) > 0))
    }
  }

  test("s25: the corrupt part file is skipped, all 25 nations survive") {
    val rows = SurfaceR10ag.s25CorruptParquet(spark, sfDir).collect()
    assert(rows.length == 25)
    assert(new java.io.File(
      "target/tmp/s25_corrupt_parquet/part-junk.parquet").exists,
      "the junk file must actually be on disk during the read")
  }
}
