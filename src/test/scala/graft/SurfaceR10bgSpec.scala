package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bg

class SurfaceR10bgSpec extends SparkSpec {

  test("every R10bg query runs at sf0.001") {
    SurfaceR10bg.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp61: replicas are unbiased-ish and est is exactly z^2") {
    val rows = SurfaceR10bg.lp61AmsF2(spark, sfDir).collect()
    assert(rows.length == 16)
    val f2 = rows.head.getLong(3)
    assert(f2 > 0)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * r.getLong(1))
      assert(r.getLong(3) == f2)
    }
    // Mean of 16 unbiased replicas should land within a factor of 3 of
    // exact F2 (Var[Z^2] ~ 2*F2^2 for +-1 sketches; a loose seeded law).
    val mean = rows.map(_.getLong(2).toDouble).sum / 16
    assert(mean > f2 / 3.0 && mean < f2 * 3.0, s"mean $mean vs f2 $f2")
  }

  test("lp62: distortion matches a driver-side replay on one pair") {
    val rows = SurfaceR10bg.lp62JlDistortion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // Replay the smallest pair end to end.
    val first = rows.head
    val (ida, idb) = (first.getLong(0), first.getLong(1))
    def qvec(id: Long): Array[Long] =
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .where(col("vec_id") === id)
        .select(explode(col("embedding")).as("v"))
        .collect().map(r => math.floor(r.getFloat(0).toDouble * 1e4 + 0.5).toLong)
    def sign(i: Int, r: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$r".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(6)
      val h = java.lang.Long.parseLong(hex, 16)
      if (h % 2 == 0) 1L else -1L
    }
    val (qa, qb) = (qvec(ida), qvec(idb))
    val d2o = qa.indices.map(i => { val d = qa(i) - qb(i); d * d }).sum
    val d2p = (1 to 8).map { r =>
      val za = qa.indices.map(i => sign(i, r) * qa(i)).sum
      val zb = qb.indices.map(i => sign(i, r) * qb(i)).sum
      val d = za - zb; d * d
    }.sum
    assert(first.getLong(2) == d2o, s"d2_orig ${first.getLong(2)} vs $d2o")
    assert(first.getLong(3) == d2p, s"d2_proj ${first.getLong(3)} vs $d2p")
    // Ratios concentrate near 1 on average across pairs.
    val meanRatio = rows.map(_.getDouble(4)).sum / rows.length
    assert(meanRatio > 0.4 && meanRatio < 2.5, s"mean ratio $meanRatio")
  }
}
