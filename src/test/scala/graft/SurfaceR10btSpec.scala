package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bt

class SurfaceR10btSpec extends SparkSpec {

  test("every R10bt query runs at sf0.001") {
    SurfaceR10bt.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m156: AUC/SE match a driver-side replay; CI brackets AUC") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val sorted = ev.sortBy(_._1)
    // average-rank U statistic replay
    val npos = ev.count(_._2 == 1L).toDouble
    val nneg = ev.length - npos
    var i = 0; var rankSumPos = 0.0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val avgRank = (i + 1 + j) / 2.0 // mean of ranks i+1..j
      (i until j).foreach(k => if (sorted(k)._2 == 1L) rankSumPos += avgRank)
      i = j
    }
    val auc = (rankSumPos - npos * (npos + 1) / 2) / (npos * nneg)
    val q1 = auc / (2 - auc)
    val q2 = 2 * auc * auc / (1 + auc)
    val se = math.sqrt((auc * (1 - auc) + (npos - 1) * (q1 - auc * auc) +
      (nneg - 1) * (q2 - auc * auc)) / (npos * nneg))
    val row = SurfaceR10bt.m156AucCi(spark, sfDir).collect().head
    assert(row.getLong(0) == npos.toLong && row.getLong(1) == nneg.toLong)
    assert(math.abs(row.getDouble(2) - auc) < 1e-3, s"auc ${row.getDouble(2)} vs $auc")
    assert(math.abs(row.getDouble(3) - se) < 1e-3)
    assert(row.getDouble(4) <= row.getDouble(2) && row.getDouble(2) <= row.getDouble(5))
  }
}
