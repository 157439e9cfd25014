package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bx

class SurfaceR10bxSpec extends SparkSpec {

  test("every R10bx query runs at sf0.001") {
    SurfaceR10bx.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m160: C/D counts match a driver-side pair count") {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("i"),
        expr("least(CAST(floor(o_totalprice / 50000) AS BIGINT), 3)").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var dd = 0L
    val cells = rows.groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }.toSeq
    for (a <- cells; b <- cells if b._1 > a._1) {
      if (b._2 > a._2) c += a._3 * b._3
      else if (b._2 < a._2) dd += a._3 * b._3
    }
    val row = SurfaceR10bx.m160GkGamma(spark, sfDir).collect().head
    assert(row.getLong(0) == c, s"C ${row.getLong(0)} vs $c")
    assert(row.getLong(1) == dd)
    assert(math.abs(row.getDouble(2) - (c - dd).toDouble / (c + dd)) < 1e-3)
  }

  test("m161: HL equals the median of the explicit difference multiset") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = daily.filter(_._1 < 1277).map(_._2)
    val b = daily.filter(_._1 >= 1277).map(_._2)
    val diffs = (for (x <- a; y <- b) yield x - y).sorted
    val p = diffs.length
    val lo = diffs((p + 1) / 2 - 1) // 1-based ceil(p/2)
    val hi = diffs(p / 2) // 1-based floor(p/2)+1
    val row = SurfaceR10bx.m161HodgesLehmann(spark, sfDir).collect().head
    assert(row.getLong(0) == p.toLong)
    assert(row.getLong(1) == lo + hi, s"hl2 ${row.getLong(1)} vs ${lo + hi}")
    assert(math.abs(row.getDouble(2) - (lo + hi) / 2.0) < 1e-9)
  }
}
