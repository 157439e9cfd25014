package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bl

class SurfaceR10blSpec extends SparkSpec {

  test("every R10bl query runs at sf0.001") {
    SurfaceR10bl.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt44: z-scores match a driver-side replay of the Monroe formula") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("text")).collect()
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
    docs.foreach { r =>
      val isA = r.getString(0) == "en"
      r.getString(1).split(" ", -1).foreach { w =>
        val (a, b) = counts.getOrElse(w, (0L, 0L))
        counts(w) = if (isA) (a + 1, b) else (a, b + 1)
      }
    }
    val na = counts.values.map(_._1).sum.toDouble
    val nb = counts.values.map(_._2).sum.toDouble
    def z(ca: Long, cb: Long): Double = {
      val aw = 100.0 * (ca + cb) / (na + nb)
      val delta = math.log((ca + aw) / (na + 100.0 - ca - aw)) -
        math.log((cb + aw) / (nb + 100.0 - cb - aw))
      delta / math.sqrt(1.0 / (ca + aw) + 1.0 / (cb + aw))
    }
    val want = counts.toSeq.filter(p => p._2._1 + p._2._2 >= 20)
      .map(p => (p._1, p._2._1, p._2._2, z(p._2._1, p._2._2)))
      .sortBy(p => (-p._4, p._1)).take(10)
    val got = SurfaceR10bl.lt44MonroeLogOdds(spark, sfDir).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w._1, s"term ${g.getString(0)} vs ${w._1}")
      assert(g.getLong(1) == w._2 && g.getLong(2) == w._3)
      assert(math.abs(g.getDouble(3) - w._4) < 1e-3)
    }
  }

  test("m150: ICC matches a driver-side replay on complete weeks") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val weeks = daily.groupBy(p => p._1 / 7).values.filter(_.size == 7).toSeq
    val row = SurfaceR10bl.m150Icc(spark, sfDir).collect().head
    assert(row.getLong(0) == weeks.length)
    if (weeks.length >= 2) {
      val gTot = weeks.map(_.map(_._2).sum).sum.toDouble
      val st2 = weeks.map(w => { val t = w.map(_._2).sum; t.toDouble * t }).sum
      val sq = weeks.flatMap(_.map(p => p._2.toDouble * p._2)).sum
      val g = weeks.length.toDouble
      val n = 7 * g
      val msb = (st2 / 7.0 - gTot * gTot / n) / (g - 1)
      val msw = (sq - st2 / 7.0) / (n - g)
      val icc = (msb - msw) / (msb + 6.0 * msw)
      assert(math.abs(row.getDouble(2) - msb) < 1e-2)
      assert(math.abs(row.getDouble(3) - msw) < 1e-2)
      assert(math.abs(row.getDouble(4) - icc) < 1e-3, s"icc ${row.getDouble(4)} vs $icc")
      assert(row.getDouble(4) >= -1.0 / 6.0 - 1e-9 && row.getDouble(4) <= 1.0)
    }
  }
}
