package graft

import org.apache.spark.sql.functions._
import graft.queries.WindowsFuncs

class WindowsFuncsSpec extends SparkSpec {

  test("every M2 query runs at sf0.001") {
    WindowsFuncs.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() >= 0, s"$name failed")
    }
  }

  test("w3 running total is monotone within a customer") {
    val df = WindowsFuncs.w3RunningTotal(spark, sfDir)
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"), "o_orderkey")
    val bad = df
      .withColumn("prev", lag("running_spend", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")))
      .where(col("prev").isNotNull && col("running_spend") < col("prev"))
      .count()
    assert(bad == 0)
  }

  test("x2 geometric mean matches exp(avg(ln)) within 1e-9") {
    val gm = WindowsFuncs.x2UdafGeomean(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = Tables.part(spark, sfDir)
      .groupBy("p_brand").agg(exp(avg(log(col("p_retailprice")))).as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ref.foreach { case (brand, g) =>
      assert(math.abs(gm(brand) - math.rint(g * 1e4) / 1e4) < 1e-4, brand)
    }
  }

  test("w1 rank relations: rn >= rnk >= drnk; ntile in 1..4") {
    val rows = WindowsFuncs.w1RankFuncs(spark, sfDir).collect()
    rows.foreach { r =>
      val (rn, rnk, drnk, q) = (r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))
      assert(rn >= rnk && rnk >= drnk && q >= 1 && q <= 4)
    }
  }
}
