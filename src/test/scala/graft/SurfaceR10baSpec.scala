package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ba

class SurfaceR10baSpec extends SparkSpec {

  test("every R10ba query runs at sf0.001") {
    SurfaceR10ba.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m138: silhouette matches a driver-side recompute on the quantized probe") {
    val vecs = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(v => math.floor(v.toDouble * 1e4 + 0.5).toLong).toArray))
    def dist(a: Array[Long], b: Array[Long]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => ((x - y) * (x - y)).toDouble }.sum)
    val sil = vecs.map { case (id, cl, q) =>
      val others = vecs.filter(_._1 != id)
      val byCl = others.groupBy(_._2).view
        .mapValues(vs => vs.map(v => dist(q, v._3)).sum / vs.length).toMap
      val ai = byCl.get(cl)
      val bi = byCl.filter(_._1 != cl).values.minOption
      val s = (ai, bi) match {
        case (None, _) => 0.0
        case (Some(a), Some(b)) => (b - a) / math.max(a, b)
        case _ => Double.NaN
      }
      (cl, s)
    }
    val expect = sil.groupBy(_._1).view
      .mapValues(vs => vs.map(_._2).sum / vs.length).toMap
    val rows = SurfaceR10ba.m138Silhouette(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == vecs.length)
    rows.foreach { r =>
      val want = expect(r.getLong(0))
      assert(math.abs(r.getDouble(2) - want) < 1e-3,
        s"cluster ${r.getLong(0)}: ${r.getDouble(2)} vs $want")
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }
}
