package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10dj

class SurfaceR10djSpec extends SparkSpec {

  test("every R10dj query runs at sf0.001") {
    SurfaceR10dj.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp74: exact per-stratum balance, complete cover, stable") {
    val out = SurfaceR10dj.lp74StratifiedKfold(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val langTotals = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum == langTotals(lang),
        s"$lang folds don't cover the stratum")
      val counts = rows.map(_._3)
      assert(counts.max - counts.min <= 1,
        s"$lang fold spread ${counts.max - counts.min} exceeds 1")
      rows.foreach(r => assert(r._4 == counts.max - counts.min))
    }
    val again = SurfaceR10dj.lp74StratifiedKfold(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq, "fold assignment not deterministic")
  }

  test("m192: MCC matches an exact replay and sits in [-1, 1]") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sorted = docs.map(_._2 * 2).sorted
    val n = sorted.length
    val med2 = if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2
    var tp = 0L; var tn = 0L; var fp = 0L; var fn = 0L
    docs.foreach { case (lang, c) =>
      val t = lang == "en"; val p = c * 2 > med2
      if (t && p) tp += 1 else if (!t && !p) tn += 1
      else if (!t && p) fp += 1 else fn += 1
    }
    val mcc = (BigDecimal(tp) * tn - BigDecimal(fp) * fn).toDouble /
      math.sqrt((BigDecimal(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        .toDouble)
    val r = SurfaceR10dj.m192Mcc(spark, sfDir).collect().head
    assert(r.getLong(0) == tp && r.getLong(1) == tn &&
      r.getLong(2) == fp && r.getLong(3) == fn,
      s"cells ${r.toSeq} vs ($tp,$tn,$fp,$fn)")
    assert(math.abs(r.getDouble(5) - mcc) < 1e-3,
      s"mcc ${r.getDouble(5)} vs $mcc")
    assert(r.getDouble(5) >= -1 - 1e-9 && r.getDouble(5) <= 1 + 1e-9)
  }
}
