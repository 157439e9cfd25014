package graft

import graft.queries.{SurfaceR10ci, SurfaceR10j, SurfaceR6h}

class SurfaceR10ciSpec extends SparkSpec {

  private def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("every R10ci query runs at sf0.001") {
    SurfaceR10ci.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lg10: modularity matches an integer replay and the identities hold") {
    val edges = SurfaceR6h.knnEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lab = SurfaceR10j.lg5LabelProp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.length.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.length.toLong }
    val degC = deg.toSeq.groupBy { case (v, _) => lab(v) }
      .map { case (c, vs) => c -> (vs.length.toLong, vs.map(_._2).sum) }
    val eC = edges.filter(e => lab(e._1) == lab(e._2))
      .groupBy(e => lab(e._1)).map { case (c, es) => c -> es.length.toLong }
    val qt = degC.map { case (c, (_, dc)) =>
      4 * m * eC.getOrElse(c, 0L) - dc * dc
    }.sum
    val rows = SurfaceR10ci.lg10Modularity(spark, sfDir).collect()
    assert(rows.length == degC.size)
    rows.foreach { r =>
      val c = r.getLong(0)
      val (nv, dc) = degC(c)
      assert(r.getLong(1) == nv, s"community $c vertices")
      assert(r.getLong(2) == dc, s"community $c degree sum")
      assert(r.getLong(3) == eC.getOrElse(c, 0L), s"community $c intra")
      assert(math.abs(r.getDouble(5) -
        r4d(qt.toDouble / (4 * m * m))) < 1e-12)
    }
    // Identities: degrees sum to 2m; intra edges can't exceed m; the
    // label-prop partition beats random wiring on this graph.
    assert(degC.values.map(_._2).sum == 2 * m)
    assert(eC.values.sum <= m)
    assert(rows.head.getDouble(5) > 0.0)
  }

  test("m170: group means match percent_rank window semantics exactly") {
    import org.apache.spark.sql.functions._
    val data = Tables.lineitem(spark, sfDir).select(col("l_returnflag"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = data.length
    val sorted = data.map(_._2).sorted
    // min-rank tie semantics: percent_rank = (#strictly-less)/(n-1)
    val lessOf = sorted.zipWithIndex.reverse.toMap // first index per value
    val expected = data.groupBy(_._1).map { case (f, rows) =>
      val ls = rows.map(r => lessOf(r._2).toLong)
      f -> (rows.length.toLong,
        r4d(ls.sum.toDouble / (rows.length.toLong * (n - 1))),
        r4d(ls.min.toDouble / (n - 1)), r4d(ls.max.toDouble / (n - 1)))
    }
    val rows = SurfaceR10ci.m170RankNormalize(spark, sfDir).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (nr, mean, mn, mx) = expected(r.getString(0))
      assert(r.getLong(1) == nr)
      assert(math.abs(r.getDouble(2) - mean) < 1e-12, s"${r.getString(0)} mean")
      assert(math.abs(r.getDouble(3) - mn) < 1e-12)
      assert(math.abs(r.getDouble(4) - mx) < 1e-12)
    }
  }
}
