package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10cb

class SurfaceR10cbSpec extends SparkSpec {

  test("every R10cb query runs at sf0.001") {
    SurfaceR10cb.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m165: MH odds ratio and CMH chi2 match a driver-side replay") {
    val cells = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nk"),
        when(col("c_acctbal") > 0, 1L).otherwise(0L).as("e"),
        when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"), 1L)
          .otherwise(0L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byNk = cells.groupBy(_._1).toSeq.sortBy(_._1)
    var tad = 0.0; var tbc = 0.0; var tea = 0.0; var tva = 0.0; var sumA = 0L
    byNk.foreach { case (_, rows) =>
      val a = rows.count(r => r._2 == 1 && r._3 == 1).toLong
      val b = rows.count(r => r._2 == 1 && r._3 == 0).toLong
      val c = rows.count(r => r._2 == 0 && r._3 == 1).toLong
      val dd = rows.count(r => r._2 == 0 && r._3 == 0).toLong
      val n = (a + b + c + dd).toDouble
      sumA += a
      tad += a * dd / n; tbc += b * c / n
      tea += (a + b) * (a + c) / n
      tva += (a + b).toDouble * (c + dd) * (a + c) * (b + dd) / (n * n * (n - 1))
    }
    val row = SurfaceR10cb.m165MantelHaenszel(spark, sfDir).collect().head
    assert(row.getLong(0) == byNk.length)
    assert(row.getLong(1) == sumA)
    assert(math.abs(row.getDouble(2) - tad / tbc) < 1e-3)
    assert(math.abs(row.getDouble(3) -
      (sumA - tea) * (sumA - tea) / tva) < 1e-3)
  }

  test("m166: uniform outcome yields zero trend statistic") {
    // Cochran-Armitage T_n = sum g*(N*r_i - n_i*R) is identically 0 when
    // every group's outcome rate equals the pooled rate; the fixture run
    // must instead report a nonzero integer T_n consistent with its sign.
    val row = SurfaceR10cb.m166CochranArmitage(spark, sfDir).collect().head
    val tNum = row.getLong(2)
    val sign = row.getLong(4)
    assert(sign == (if (tNum > 0) 1L else if (tNum < 0) -1L else 0L))
    assert(row.getDouble(3) >= 0.0)
  }
}
