package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR11h

class SurfaceR11hSpec extends SparkSpec {

  test("every R11h query runs at sf0.001") {
    SurfaceR11h.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m207: lasso shrinks vs OLS and matches an unquantized replay") {
    import spark.implicits._
    val got = SurfaceR11h.queries("m207_lasso_cd")(spark, sfDir)
      .select("feature", "beta").as[(Long, Double)].collect()
      .sortBy(_._1).map(_._2)
    assert(got.length == 8)

    // independent full-precision replay of the identical procedure
    val data = Tables.embeddings(spark, sfDir)
      .selectExpr("transform(slice(embedding, 1, 8), x -> CAST(x AS DOUBLE))",
        "CAST(label AS DOUBLE)")
      .as[(Seq[Double], Double)].collect()
    val n = data.length
    val xs = Array.tabulate(8) { j =>
      val col = data.map(_._1(j))
      val mu = col.sum / n
      val sd = math.sqrt(col.map(v => v * v).sum / n - mu * mu)
      col.map(v => (v - mu) / sd)
    }
    val myv = data.map(_._2).sum / n
    val yc = data.map(_._2 - myv)
    val dj = xs.map(c => c.map(v => v * v).sum / n)
    val b = Array.fill(8)(0.0)
    for (_ <- 1 to 2; j <- 0 until 8) {
      var rho = 0.0
      var r = 0
      while (r < n) {
        var res = yc(r)
        var k = 0
        while (k < 8) { res -= xs(k)(r) * b(k); k += 1 }
        rho += xs(j)(r) * (res + xs(j)(r) * b(j))
        r += 1
      }
      rho /= n
      b(j) =
        if (rho > 0.05) (rho - 0.05) / dj(j)
        else if (rho < -0.05) (rho + 0.05) / dj(j)
        else 0.0
    }
    got.zip(b).zipWithIndex.foreach { case ((g, r), j) =>
      assert(math.abs(g - r) < 1e-4, s"feature ${j + 1}: $g vs replay $r")
    }
    // the L1 penalty must actually zero something on this fixture
    assert(got.count(_ == 0.0) >= 1, s"no sparsity: ${got.mkString(",")}")
    assert(got.exists(_ != 0.0), "all-zero fit — lambda too large?")
  }
}
