package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10cy

class SurfaceR10cySpec extends SparkSpec {

  test("every R10cy query runs at sf0.001") {
    SurfaceR10cy.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp72: segments tile the document exactly and cuts are stable") {
    val lens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = SurfaceR10cy.lp72FimTransform(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, mode, lo, hi) = (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))
      val (p, m, s) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(Set("psm", "spm")(mode), s"doc $id mode $mode")
      assert(lo >= 1 && lo <= hi && hi <= lens(id), s"doc $id cuts $lo..$hi")
      assert(p + m + s == lens(id), s"doc $id segments $p+$m+$s != ${lens(id)}")
      assert(r.getString(7).length == 32)
    }
    // determinism: cut choice rides on md5(text) only
    val again = SurfaceR10cy.lp72FimTransform(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("lt63: A and B match an exact template-count replay") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 3600000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2).map(_._3) }
    val out = SurfaceR10cy.lt63SampleEntropy(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    daily.foreach { case (t, xs) =>
      val n = xs.length
      val mean = xs.sum.toDouble / n
      val sd = math.sqrt(xs.map(v => (v - mean) * (v - mean)).sum / (n - 1))
      val r0 = math.floor(0.2 * sd).toLong
      val tpls = xs.indices.dropRight(2).map(i => (xs(i), xs(i + 1), xs(i + 2)))
      var b = 0L; var a = 0L
      for (i <- tpls.indices; j <- (i + 1) until tpls.length) {
        val (x0, x1, x2) = tpls(i); val (y0, y1, y2) = tpls(j)
        if (math.abs(x0 - y0) <= r0 && math.abs(x1 - y1) <= r0) {
          b += 1
          if (math.abs(x2 - y2) <= r0) a += 1
        }
      }
      val (bOut, aOut) = out(t)
      assert(bOut == b, s"$t B $bOut vs $b")
      assert(aOut == a, s"$t A $aOut vs $a")
    }
  }
}
