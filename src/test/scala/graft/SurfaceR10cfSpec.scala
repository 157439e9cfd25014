package graft

import graft.queries.{SurfaceR10cf, SurfaceR6h}

class SurfaceR10cfSpec extends SparkSpec {

  test("every R10cf query runs at sf0.001") {
    SurfaceR10cf.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lg9: integer HITS matches a driver-side replay; hubs need out-edges") {
    val edges = SurfaceR6h.knnDirected(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var h = verts.map(_ -> 1L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      a = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => h.getOrElse(e._1, 0L)).sum
      }
      h = edges.groupBy(_._1).map { case (v, es) =>
        v -> es.map(e => a.getOrElse(e._2, 0L)).sum
      }
    }
    val expected = verts
      .map(v => (v, a.getOrElse(v, 0L), h.getOrElse(v, 0L)))
      .sortBy { case (v, au, _) => (-au, v) }.take(15)
    val rows = SurfaceR10cf.lg9Hits(spark, sfDir).collect()
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (v, au, hb)) =>
      assert(r.getLong(0) == v, s"vertex $v")
      assert(r.getLong(1) == au, s"authority of $v")
      assert(r.getLong(2) == hb, s"hub of $v")
    }
    // Every vertex has out-degree 3 by construction, so every listed
    // vertex carries a strictly positive hub score.
    assert(rows.forall(_.getLong(2) > 0))
    // Normalized readouts peak at 1 somewhere in the full graph, so the
    // top row's auth_norm is exactly 1 (it has the max authority).
    assert(math.abs(rows.head.getDouble(3) - 1.0) < 1e-12)
  }

  test("lt51: partial sums conserve to zero and eta matches a replay") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val u = xs.map(x => n * x - sx)
      assert(u.sum == 0L, s"$tpe centered sum") // conservation law
      val scans = u.scanLeft(0L)(_ + _).drop(1)
      val num = scans.map(s => s * s).sum
      val den = u.map(v => v * v).sum
      tpe -> (n, num.toDouble / (n * den))
    }
    val rows = SurfaceR10cf.lt51Kpss(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, eta) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - math.floor(eta * 1e4 + 0.5) / 1e4) < 1e-12,
        s"${r.getString(0)} eta")
      assert(r.getBoolean(3) == (eta > 0.463))
    }
  }
}
