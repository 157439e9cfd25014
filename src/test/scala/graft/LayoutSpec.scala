package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  /** Rows the parquet reader actually produced (post row-group skip). */
  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.count()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("range-sorted layout prunes row groups a random layout must read") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val sortedOut = new java.io.File("target/tmp/layout_sorted").getAbsolutePath
    val randomOut = new java.io.File("target/tmp/layout_random").getAbsolutePath
    Layout.writeRangeSorted(orders, sortedOut, "o_totalprice", partitions = 8)
    orders.repartition(8).write.mode("overwrite").parquet(randomOut)

    val lo = 1000.0; val hi = 5000.0
    def narrow(path: String) = spark.read.parquet(path)
      .where(col("o_totalprice") >= lo && col("o_totalprice") <= hi)
    // same answer either way...
    assert(narrow(sortedOut).count() == narrow(randomOut).count())
    // ...but the sorted layout's footer stats skip most row groups
    val sortedRead = scanRows(narrow(sortedOut))
    val randomRead = scanRows(narrow(randomOut))
    assert(sortedRead * 2 <= randomRead,
      s"sorted layout read $sortedRead rows vs $randomRead — no pruning benefit")
  }

  test("z-order layout prunes on BOTH dimensions; 1-D sort only on its own") {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice", "o_custkey")
    val zOut = new java.io.File("target/tmp/layout_z").getAbsolutePath
    val randomOut = new java.io.File("target/tmp/layout_rand2").getAbsolutePath
    Layout.writeZOrdered(orders, zOut, "o_totalprice", "o_custkey",
      bits = 16, partitions = 16)
    orders.repartition(16).write.mode("overwrite").parquet(randomOut)

    // narrow predicate on each dimension separately (top ~eighth of range)
    def onPrice(p: String) = spark.read.parquet(p)
      .where(col("o_totalprice") >= 450000.0)
    def onCust(p: String) = {
      val cHi = orders.agg(max("o_custkey")).head().getLong(0)
      spark.read.parquet(p).where(col("o_custkey") >= cHi - cHi / 8)
    }
    // correctness unchanged by layout
    assert(onPrice(zOut).count() == onPrice(randomOut).count())
    assert(onCust(zOut).count() == onCust(randomOut).count())
    // z-layout prunes both dimensions
    val zPrice = scanRows(onPrice(zOut)); val rPrice = scanRows(onPrice(randomOut))
    val zCust = scanRows(onCust(zOut)); val rCust = scanRows(onCust(randomOut))
    assert(zPrice * 2 <= rPrice, s"z read $zPrice vs random $rPrice on price")
    assert(zCust * 2 <= rCust, s"z read $zCust vs random $rCust on custkey")
  }
}
