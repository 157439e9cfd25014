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
}
