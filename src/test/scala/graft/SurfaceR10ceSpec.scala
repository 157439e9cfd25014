package graft

import graft.queries.{SurfaceR10ce, SurfaceR6h}

class SurfaceR10ceSpec extends SparkSpec {

  test("every R10ce query runs at sf0.001") {
    SurfaceR10ce.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lg8: peel trajectory matches a driver-side replay and is monotone") {
    val edges = SurfaceR6h.knnEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Driver replay: symmetrize, then peel degree<4 for 6 rounds.
    var adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var verts = adj.map(_._1).toSet
    def counts(vs: Set[Long]): (Long, Long) = {
      val ind = adj.filter { case (a, b) => vs(a) && vs(b) }
      (ind.map(_._1).distinct.length.toLong, ind.length.toLong)
    }
    var expected = Vector(counts(verts))
    for (_ <- 1 to 6) {
      val deg = adj.filter { case (a, b) => verts(a) && verts(b) }
        .groupBy(_._1).map { case (v, es) => v -> es.length }
      verts = deg.filter(_._2 >= 4).keySet
      expected :+= counts(verts)
    }
    val rows = SurfaceR10ce.lg8Kcore(spark, sfDir).collect()
    assert(rows.length == 7)
    rows.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == expected(i)._1, s"round $i vertices")
      assert(r.getLong(2) == expected(i)._2, s"round $i degree sum")
    }
    // Peeling is monotone: vertex counts never increase.
    val vs = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(vs.zip(vs.drop(1)).forall { case (a, b) => b <= a })
  }

  test("m168: lambda=0 solves the OLS normal equations; shrinkage is monotone") {
    val rows = SurfaceR10ce.m168RidgePath(spark, sfDir).collect()
      .sortBy(_.getDouble(0))
    assert(rows.length == 3)
    val norms = rows.map(r => math.hypot(r.getDouble(1), r.getDouble(2)))
    // L2 penalty strictly shrinks the standardized coefficient norm.
    assert(norms(0) >= norms(1) - 1e-9 && norms(1) >= norms(2) - 1e-9,
      norms.mkString(","))
    // The two predictors are strongly collinear on this fixture, and
    // together they carry real signal: OLS norm is substantial.
    assert(rows(0).getDouble(3) > 0.5, s"r12 ${rows(0).getDouble(3)}")
    assert(norms(0) > 0.3, s"ols norm ${norms(0)}")
  }
}
