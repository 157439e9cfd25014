package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10w

class SurfaceR10wSpec extends SparkSpec {

  test("every R10w query runs at sf0.001") {
    SurfaceR10w.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt31: entropy bounded by ln(distinct chars); covers all docs") {
    val rows = SurfaceR10w.lt31CharEntropy(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val h = r.getDouble(3)
      assert(h >= -1e-9)
      assert(h <= math.log(r.getLong(2).toDouble) + 1e-3,
        s"entropy $h exceeds ln(${r.getLong(2)})")
    }
  }

  test("lp42: deciles partition the corpus with ~equal mass") {
    val rows = SurfaceR10w.lp42CurriculumMix(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == total)
    val byDecile = rows.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum)
    assert(byDecile.keys.min >= 1 && byDecile.keys.max <= 10)
    byDecile.values.foreach(n =>
      assert(math.abs(n - total / 10.0) <= total * 0.06,
        s"decile mass $n far from ${total / 10.0}"))
  }

  test("a36: Theil decomposition identity holds") {
    val rows = SurfaceR10w.a36TheilDecomposition(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2)),
          r.getDouble(3)))).toMap
    val groups = rows.keys.filterNot(g => g == "TOTAL" || g == "BETWEEN")
    assert(groups.size == 5)
    val (nTot, _, tTotal) = rows("TOTAL")
    val (_, _, tBetween) = rows("BETWEEN")
    // T_total = T_between + sum_g share_g * (mu_g / mu) * T_g
    val muTot = rows("TOTAL")._2.get
    val withinSum = groups.map { g =>
      val (ng, mug, tg) = rows(g)
      (ng.toDouble / nTot) * (mug.get / muTot) * tg
    }.sum
    assert(math.abs(tTotal - (tBetween + withinSum)) < 1e-3,
      s"decomposition broken: $tTotal vs ${tBetween + withinSum}")
    assert(tTotal >= 0 && tBetween >= -1e-9)
  }
}
