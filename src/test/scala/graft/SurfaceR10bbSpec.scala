package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bb

class SurfaceR10bbSpec extends SparkSpec {

  test("every R10bb query runs at sf0.001") {
    SurfaceR10bb.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt41: MSTTR matches a driver-side segmentation replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val bySource = docs.groupBy(_._1).view.mapValues { ds =>
      val ttrs = ds.flatMap { case (_, toks) =>
        toks.grouped(25).filter(_.length == 25)
          .map(seg => seg.distinct.length.toLong)
      }
      (ttrs.length.toLong, ttrs.sum)
    }.toMap
    val rows = SurfaceR10bb.lt41Msttr(spark, sfDir).collect()
    val expectSources = bySource.filter(_._2._1 > 0)
    assert(rows.length == expectSources.size,
      s"${rows.length} sources vs ${expectSources.size}")
    rows.foreach { r =>
      val (nSeg, sumT) = bySource(r.getString(0))
      assert(r.getLong(1) == nSeg, s"segments for ${r.getString(0)}")
      val want = sumT.toDouble / (25.0 * nSeg)
      assert(math.abs(r.getDouble(2) - want) < 1e-3, s"msttr for ${r.getString(0)}")
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
    }
  }
}
