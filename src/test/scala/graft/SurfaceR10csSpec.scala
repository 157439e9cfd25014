package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10cs

class SurfaceR10csSpec extends SparkSpec {

  test("every R10cs query runs at sf0.001") {
    SurfaceR10cs.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("x23: cogroup reconciliation equals the join+agg replay") {
    val heads = Tables.orders(spark, sfDir).select(col("o_orderkey"),
        col("o_orderstatus"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("hc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lines = Tables.lineitem(spark, sfDir).select(col("l_orderkey"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("lc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val linesBy = lines.groupBy(_._1)
    val headKeys = heads.map(_._1).toSet
    val perStatus = heads.groupBy(_._2).map { case (st, hs) =>
      val ls = hs.flatMap(h => linesBy.getOrElse(h._1, Array.empty))
      st -> (hs.length.toLong, ls.length.toLong,
        hs.map(_._3).sum, ls.map(_._2).sum)
    } ++ {
      val orphan = lines.filterNot(l => headKeys(l._1))
      if (orphan.isEmpty) Map.empty
      else Map("ORPHAN_LINES" ->
        (0L, orphan.length.toLong, 0L, orphan.map(_._2).sum))
    }
    val rows = SurfaceR10cs.x23Cogroup(spark, sfDir).collect()
    assert(rows.length == perStatus.size)
    rows.foreach { r =>
      val (no, nl, hc, lc) = perStatus(r.getString(0))
      assert(r.getLong(1) == no && r.getLong(2) == nl, r.getString(0))
      assert(r.getLong(3) == hc && r.getLong(4) == lc, r.getString(0))
    }
  }

  test("x24: the fold finds each flag's lexicographically top line") {
    val lines = Tables.lineitem(spark, sfDir).select(col("l_returnflag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("c"),
        col("l_orderkey"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = lines.groupBy(_._1).map { case (f, ls) =>
      f -> ls.maxBy(l => (l._2, l._3, l._4))
    }
    val rows = SurfaceR10cs.x24ReduceGroups(spark, sfDir).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._2 && r.getLong(2) == e._3 &&
        r.getLong(3) == e._4, r.getString(0))
    }
  }
}
