package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ae

class SurfaceR10aeSpec extends SparkSpec {

  test("every R10ae query runs at sf0.001") {
    SurfaceR10ae.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m104: ratings normalized to K; win order implies rating order") {
    val rows = SurfaceR10ae.m104BradleyTerry(spark, sfDir).collect()
    assert(rows.length >= 2)
    val ratings = rows.map(_.getDouble(2))
    assert(math.abs(ratings.sum - rows.length) < 1e-2,
      s"ratings sum ${ratings.sum} != K ${rows.length}")
    ratings.foreach(r => assert(r > 0))
    // with a balanced comparison design, more total wins should not
    // produce a LOWER rating by a wide margin (BT is monotone in the
    // win profile; allow slack for unbalanced n_ij)
    val byWins = rows.sortBy(_.getLong(1))
    assert(byWins.last.getDouble(2) >= byWins.head.getDouble(2) - 0.05,
      "rating order wildly contradicts win order")
  }

  test("m104: driver fixed point is stable (rerun gives identical output)") {
    val a = SurfaceR10ae.m104BradleyTerry(spark, sfDir).collect()
    val b = SurfaceR10ae.m104BradleyTerry(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
