package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10as

class SurfaceR10asSpec extends SparkSpec {

  test("every R10as query runs at sf0.001") {
    SurfaceR10as.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m129: arm counts sum to n and chi2 matches the recompute; balanced split passes") {
    val r = SurfaceR10as.m129SrmCheck(spark, sfDir).collect().head
    val (n, ca, cb, cc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ca + cb + cc == n)
    val chi2 = math.pow(ca - n * 0.5, 2) / (n * 0.5) +
      math.pow(cb - n * 0.25, 2) / (n * 0.25) +
      math.pow(cc - n * 0.25, 2) / (n * 0.25)
    assert(math.abs(r.getDouble(4) - chi2) < 1e-3)
    // md5 is uniform: a correct 50/25/25 split must NOT trip the alarm
    assert(r.getLong(5) == 0, s"SRM flagged on a clean split (chi2=$chi2)")
  }

  test("m129: negative control — a deliberately skewed split trips the flag") {
    // simulate dropping half of arm C (a buggy logging filter)
    val r = SurfaceR10as.m129SrmCheck(spark, sfDir).collect().head
    val (n0, ca, cb, cc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val ccSkew = cc / 2
    val n = ca + cb + ccSkew
    val chi2 = math.pow(ca - n * 0.5, 2) / (n * 0.5) +
      math.pow(cb - n * 0.25, 2) / (n * 0.25) +
      math.pow(ccSkew - n * 0.25, 2) / (n * 0.25)
    assert(n0 > 0 && chi2 > 7.824,
      s"skewed split should exceed the critical value, got $chi2")
  }

  test("s27: the embedded newline survives the round-trip intact") {
    val rows = SurfaceR10as.s27MultilineCsv(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getString(2).toLowerCase == r.getString(3),
        s"first/second line mismatch for ${r.getLong(0)}")
      assert(r.getLong(1) == r.getString(2).length + 1 + r.getString(3).length,
        s"memo_len wrong for ${r.getLong(0)}")
    }
  }
}
