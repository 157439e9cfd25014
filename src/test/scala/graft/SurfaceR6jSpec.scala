package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR6j

class SurfaceR6jSpec extends SparkSpec {

  test("LP13: winsorize clips symmetric tails and the clipped mean stays inside the bounds") {
    val rows = SurfaceR6j.lp13Winsorize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (flag, nLow, nHigh) = (r.getString(0), r.getLong(1), r.getLong(2))
      // ~5% in each tail (interpolated quantile ⇒ at most ceil(5%) strict outliers)
      assert(nLow <= n(flag) * 0.05 + 1)
      assert(nHigh <= n(flag) * 0.05 + 1)
      assert(nLow >= n(flag) * 0.04 - 2 && nHigh >= n(flag) * 0.04 - 2)
    }
  }

  test("LP14: every class is downsampled to exactly the minority count, reproducibly") {
    val out = SurfaceR6j.lp14ClassBalance(spark, sfDir)
    val perClass = out.groupBy("label").count().collect().map(_.getLong(1)).toSet
    assert(perClass.size == 1, s"unbalanced classes: $perClass")
    val minCount = Tables.embeddings(spark, sfDir)
      .groupBy("label").count().agg(min("count")).collect()(0).getLong(0)
    assert(perClass.head == minCount)
    // pure function of vec_id: a second evaluation picks the same rows
    val again = SurfaceR6j.lp14ClassBalance(spark, sfDir)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("Q18: SQL PIVOT equals conditional aggregation") {
    val piv = SurfaceR6j.q18SqlPivot(spark, sfDir)
    val cond = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(Orc.r4(sum(when(col("l_linestatus") === "O", col("l_quantity")))).as("o_qty"),
        Orc.r4(sum(when(col("l_linestatus") === "F", col("l_quantity")))).as("f_qty"))
    assert(piv.count() > 0)
    assert(piv.exceptAll(cond).count() == 0 && cond.exceptAll(piv).count() == 0)
  }
}
