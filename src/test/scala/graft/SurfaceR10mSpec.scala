package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10m

class SurfaceR10mSpec extends SparkSpec {

  test("every R10m query runs at sf0.001") {
    SurfaceR10m.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt21: PMI matches a driver-side recompute for a sample pair") {
    val rows = SurfaceR10m.lt21Pmi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("t")).collect()
      .map(_.getSeq[String](0))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val ntok = toks.map(_.size.toLong).sum.toDouble
    val npair = toks.map(t => (t.size - 1).toLong).sum.toDouble
    val r = rows.head
    val (w1, w2, cxy) = (r.getString(0), r.getString(1), r.getLong(2))
    val expect = math.log((cxy / npair) /
      ((uni(w1) / ntok) * (uni(w2) / ntok)))
    assert(math.abs(r.getDouble(3) - expect) < 1e-3,
      s"pmi(${w1} ${w2}) = ${r.getDouble(3)} vs $expect")
    // every reported pair clears the support floor
    rows.foreach(r => assert(r.getLong(2) >= 10))
  }

  test("lt22: rolling corr stays in [-1, 1] and windows are full") {
    val rows = SurfaceR10m.lt22RollingCorr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(4)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr out of range: $c")
    }
  }

  test("lp34: draw is deterministic, within range, and self-free") {
    val a = SurfaceR10m.lp34NegativeSampling(spark, sfDir).collect()
    val b = SurfaceR10m.lp34NegativeSampling(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val nDocs = Tables.documents(spark, sfDir).count()
    a.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < nDocs)
      assert(r.getLong(2) != r.getLong(0), "self-pair survived rejection")
    }
    // each anchor contributes at most 3 negatives (k = 0..2, minus rejects)
    a.groupBy(_.getLong(0)).foreach { case (_, g) => assert(g.length <= 3) }
  }

  test("lp35: all five rules present; clean fixture passes all") {
    val rows = SurfaceR10m.lp35DqExpectations(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) == 0L))
    }
  }

  test("lg6: cc in [0,1]; triangle vertices match lg2's counts") {
    val rows = SurfaceR10m.lg6ClusteringCoef(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cc = r.getDouble(3)
      assert(cc >= 0.0 && cc <= 1.0 + 1e-9, s"cc out of [0,1]: $cc")
      val maxTri = r.getLong(1) * (r.getLong(1) - 1) / 2
      assert(r.getLong(2) <= maxTri, "more triangles than degree allows")
    }
    val lg2 = graft.queries.SurfaceR6h.lg2Triangles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(lg2.getOrElse(r.getLong(0), 0L) == r.getLong(2),
        s"triangle count diverges from lg2 for ${r.getLong(0)}")
    }
  }
}
