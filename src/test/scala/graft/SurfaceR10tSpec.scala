package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10t

class SurfaceR10tSpec extends SparkSpec {

  test("every R10t query runs at sf0.001") {
    SurfaceR10t.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m91: TOST verdict consistent with its own one-sided statistics") {
    val r = SurfaceR10t.m91Tost(spark, sfDir).collect().head
    val (tl, tu, eq) = (r.getDouble(3), r.getDouble(4), r.getBoolean(5))
    assert(eq == (tl > 1.645 && tu > 1.645) ||
      math.abs(tl - 1.645) < 1e-3 || math.abs(tu - 1.645) < 1e-3)
  }

  test("lt29: matrix covers all docs; shares sum to 1 per actual lang") {
    val rows = SurfaceR10t.lt29LangidConfusion(spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum ==
      Tables.documents(spark, sfDir).count())
    rows.groupBy(_.getString(0)).foreach { case (lang, g) =>
      val tot = g.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-2, s"$lang shares sum to $tot")
    }
    // zh has no stopword list: it must never be predicted as zh
    rows.foreach(r => assert(r.getString(1) != "zh"))
  }

  test("lp41: shard stats are internally consistent") {
    val r = SurfaceR10t.lp41ShardSkew(spark, sfDir).collect().head
    assert(r.getLong(1) == Tables.documents(spark, sfDir).count())
    assert(r.getLong(2) <= r.getLong(3))
    assert(r.getDouble(4) >= 1.0, "max/mean below 1")
    assert(r.getDouble(5) >= 0.0)
    assert(r.getLong(0) == 16L, "md5 first nibble yields 16 shards")
  }

  test("m93: required n grows with the pooled variance formula") {
    val r = SurfaceR10t.m93PowerAnalysis(spark, sfDir).collect().head
    val expect = 2.0 * math.pow(1.96 + 0.8416, 2) * r.getDouble(2) /
      (2500.0 * 2500.0)
    assert(math.abs(r.getDouble(3) - expect) < 1e-2)
    assert(r.getDouble(3) > 0)
  }

  test("lt30: families have >= 2 docs and plausible source spans") {
    val rows = SurfaceR10t.lt30TemplatePrefix(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
    }
  }
}
