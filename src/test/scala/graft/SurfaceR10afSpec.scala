package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10af

class SurfaceR10afSpec extends SparkSpec {

  test("every R10af query runs at sf0.001") {
    SurfaceR10af.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m105: tau-b matches a driver-side pair count for one flag") {
    val rows = SurfaceR10af.m105KendallTau(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val flag = rows.head.getString(0)
    val data = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === flag)
      .select(col("l_quantity").cast("long"),
        floor(col("l_extendedprice") / 10000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var dCnt = 0L; var tx = 0L; var ty = 0L
    for (i <- data.indices; j <- (i + 1) until data.length) {
      val ((x1, y1), (x2, y2)) = (data(i), data(j))
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) c += 1 else dCnt += 1
      } else if (x1 == x2 && y1 != y2) tx += 1
      else if (x1 != x2) ty += 1
      else { tx += 1; ty += 1 }
    }
    val n0 = data.length.toLong * (data.length - 1) / 2
    // margin-based tie counts (tau-b convention): pairs tied in x
    // regardless of y, and vice versa
    val txm = data.groupBy(_._1).values.map(g =>
      g.length.toLong * (g.length - 1) / 2).sum
    val tym = data.groupBy(_._2).values.map(g =>
      g.length.toLong * (g.length - 1) / 2).sum
    val tau = (c - dCnt).toDouble /
      math.sqrt((n0 - txm).toDouble * (n0 - tym))
    val got = rows.head.getDouble(4)
    assert(math.abs(got - tau) < 1e-3, s"tau $got vs $tau")
    assert(rows.head.getLong(2) == c && rows.head.getLong(3) == dCnt)
  }

  test("m106: alpha consistent with its own variance columns") {
    val r = SurfaceR10af.m106CronbachAlpha(spark, sfDir).collect().head
    val (sumVar, totVar, alpha) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(totVar > 0 && sumVar > 0)
    val expect = (6.0 / 5.0) * (1.0 - sumVar / totVar)
    assert(math.abs(alpha - expect) < 1e-2, s"alpha $alpha vs $expect")
    assert(alpha <= 1.0 + 1e-9)
  }
}
