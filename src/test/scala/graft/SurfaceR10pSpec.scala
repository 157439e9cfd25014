package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10p

class SurfaceR10pSpec extends SparkSpec {

  test("every R10p query runs at sf0.001") {
    SurfaceR10p.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m87: chi2 matches (b-c)^2/(b+c) on the reported counts") {
    val r = SurfaceR10p.m87Mcnemar(spark, sfDir).collect().head
    val (b, c) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(b + c > 0)
    assert(math.abs(r.getDouble(2) - (b - c) * (b - c) / (b + c)) < 1e-3)
  }

  test("m88: cells tile the table; CI brackets the point estimate") {
    val r = SurfaceR10p.m88OddsRatio(spark, sfDir).collect().head
    val total = (0 to 3).map(r.getLong).sum
    assert(total == Tables.orders(spark, sfDir).count())
    val (or0, lo, hi) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(lo <= or0 + 1e-9 && or0 <= hi + 1e-9, s"CI [$lo,$hi] vs $or0")
    assert(lo > 0)
  }

  test("lp38: English docs score higher on average than non-English") {
    val rows = SurfaceR10p.lp38MooreLewis(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val langs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, rest) = rows.partition { case (id, _) => langs(id) == "en" }
    val enMean = en.values.sum / en.size
    val restMean = rest.values.sum / rest.size
    assert(enMean > restMean,
      s"in-domain docs do not outscore: $enMean vs $restMean")
    // every doc is scored
    assert(rows.size == langs.size)
  }

  test("lp39: buckets cover all docs; waste consistent; padded >= tokens") {
    val rows = SurfaceR10p.lp39PaddingWaste(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), "padded below token count")
      val expect =
        (r.getLong(3) - r.getLong(2)).toDouble / r.getLong(3)
      assert(math.abs(r.getDouble(4) - expect) < 1e-3)
    }
  }
}
