package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10au

class SurfaceR10auSpec extends SparkSpec {

  test("every R10au query runs at sf0.001") {
    SurfaceR10au.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m131: a hash split is balanced — both SMDs near zero and match a recompute") {
    val r = SurfaceR10au.m131SmdBalance(spark, sfDir).collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    // randomized (hash) assignment must not GROSSLY imbalance covariates;
    // at the ~150-row sf0.001 fixture the SMD sampling noise is ~0.2, so
    // the bound is loose — the driver-side recompute below is the real check
    assert(math.abs(r.getDouble(2)) < 1.0, s"smd_acctbal ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3)) < 1.0, s"smd_nation ${r.getDouble(3)}")
    // driver-side recompute of the acctbal SMD
    val rows = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(
        expr("(instr('0123456789abcdef', substr(md5(concat(c_custkey, ':srm')), 1, 1)) - 1)")
          .as("nib"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("bal"))
      .collect().map(x => (x.getInt(0), x.getLong(1)))
    val a = rows.filter(_._1 < 8).map(_._2.toDouble)
    val b = rows.filter(p => p._1 >= 8 && p._1 < 12).map(_._2.toDouble)
    def mv(v: Array[Double]) = {
      val m = v.sum / v.length
      (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val (ma, va) = mv(a); val (mb, vb) = mv(b)
    val smd = (ma - mb) / math.sqrt((va + vb) / 2.0)
    assert(math.abs(r.getDouble(2) - smd) < 1e-3, s"${r.getDouble(2)} vs $smd")
  }

  test("m132: LOO excludes the row's own label (segment-constant check)") {
    val rows = SurfaceR10au.m132LooEncoding(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // within a segment, rows with y=1 must encode strictly lower than
    // rows with y=0 (their own positive label is removed), unless the
    // segment is single-valued
    rows.groupBy(_.getString(1)).foreach { case (seg, rs) =>
      val enc1 = rs.filter(_.getLong(2) == 1L).map(_.getDouble(3)).distinct
      val enc0 = rs.filter(_.getLong(2) == 0L).map(_.getDouble(3)).distinct
      assert(enc1.length <= 1 && enc0.length <= 1,
        s"LOO encoding not constant per (seg,label) in $seg")
      if (enc1.nonEmpty && enc0.nonEmpty)
        assert(enc1.head < enc0.head,
          s"LOO of y=1 rows should be lower in $seg: ${enc1.head} vs ${enc0.head}")
      // recompute: (sy - y) / (n - 1)
      val n = rs.length
      val sy = rs.map(_.getLong(2)).sum
      rs.take(5).foreach { r =>
        val want = (sy - r.getLong(2)).toDouble / (n - 1)
        assert(math.abs(r.getDouble(3) - want) < 1e-3, s"LOO value in $seg")
      }
    }
  }
}
