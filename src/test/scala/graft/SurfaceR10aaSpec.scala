package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10aa

class SurfaceR10aaSpec extends SparkSpec {

  test("every R10aa query runs at sf0.001") {
    SurfaceR10aa.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp45: one verdict per doc; dup verdicts match the keeper join") {
    val rows = SurfaceR10aa.lp45QuarantineRouter(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    val verdicts = rows.map(_.getString(1)).toSet
    verdicts.foreach(v => assert(
      v == "keep" || v.startsWith("reject:") || v.startsWith("review:"),
      s"unknown verdict $v"))
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keepers = texts.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    val flaggedDups = rows.filter(_.getString(1) == "reject:exact_dup")
      .map(_.getLong(0)).toSet
    val expectDups = texts.map(_._1).filterNot(keepers.contains).toSet
    assert(flaggedDups == expectDups, "dup verdicts diverge from keeper set")
  }

  test("lp46: leakage bounded by the smaller side; rates in [0,1]") {
    val r = SurfaceR10aa.lp46SplitLeakage(spark, sfDir).collect().head
    val (tr, te, shared) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(shared <= math.min(tr, te))
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
    assert(tr > te, "train side should carry ~8x the test shingles")
  }
}
