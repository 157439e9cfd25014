package graft

import graft.queries.SurfaceR10cd

class SurfaceR10cdSpec extends SparkSpec {

  test("every R10cd query runs at sf0.001") {
    SurfaceR10cd.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("l17: int8 audit bounds hold (recall in [0,1], max err sane)") {
    val row = SurfaceR10cd.l17Int8Audit(spark, sfDir).collect().head
    val recall = row.getDouble(1)
    assert(recall >= 0.0 && recall <= 1.0)
    // Symmetric max-abs int8 keeps cosine error small; 0.1 is a loose
    // ceiling (typical |dcos| for 127-level quantization is < 0.02).
    assert(row.getDouble(2) <= row.getDouble(3) + 1e-9)
    assert(row.getDouble(3) < 0.1, s"max_abs_err ${row.getDouble(3)}")
  }

  test("ls6: fused top-3 ranks are a permutation prefix per probe") {
    val rows = SurfaceR10cd.ls6RrfFusion(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (a, grp) =>
      assert(grp.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L),
        s"probe $a fused ranks")
      // RRF score must be monotone in the fused rank.
      val byRank = grp.sortBy(_.getLong(4)).map(_.getDouble(5))
      assert(byRank.zip(byRank.drop(1)).forall { case (x, y) => x >= y - 1e-9 })
    }
  }
}
