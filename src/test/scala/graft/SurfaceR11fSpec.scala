package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR11f

class SurfaceR11fSpec extends SparkSpec {

  test("every R11f query runs at sf0.001") {
    SurfaceR11f.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m204: Newton converges and matches an unquantized Scala Cox fit") {
    import spark.implicits._
    val rows = SurfaceR11f.queries("m204_cox_ph")(spark, sfDir)
      .orderBy("round").collect()
    assert(rows.length == 3)
    val u1 = math.abs(rows(0).getAs[Double]("score_u"))
    val u3 = math.abs(rows(2).getAs[Double]("score_u"))
    assert(u3 < u1 / 100 + 1e-3, s"score did not collapse: $u1 -> $u3")
    assert(rows.forall(_.getAs[Double]("info") > 0), "information not positive")
    val betaQ = rows(2).getAs[Double]("beta")

    // independent full-precision replay (no quantization anywhere)
    val data = Tables.orders(spark, sfDir).select(
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"),
      (col("o_totalprice") / 100000.0d).as("x"))
      .as[(Long, Long, Double)].collect()
    var beta = 0.0
    for (_ <- 1 to 3) {
      val byDur = data.groupBy(_._1).toSeq.sortBy(-_._1)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var u = 0.0; var inf = 0.0
      byDur.foreach { case (_, pts) =>
        pts.foreach { case (_, _, x) =>
          val e = math.exp(beta * x)
          s0 += e; s1 += x * e; s2 += x * x * e
        }
        val d = pts.count(_._2 == 1L)
        if (d > 0) {
          val sx = pts.filter(_._2 == 1L).map(_._3).sum
          u += sx - d * (s1 / s0)
          inf += d * (s2 / s0 - (s1 / s0) * (s1 / s0))
        }
      }
      beta = beta + u / inf
    }
    assert(math.abs(betaQ - beta) < 1e-3,
      s"quantized fit $betaQ vs full-precision $beta")
  }
}
