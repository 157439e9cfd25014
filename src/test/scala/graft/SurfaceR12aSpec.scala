package graft

import org.apache.spark.sql.functions._

/** Laws for the round-12 batch 1: MERGE-INTO upsert and the directed
  * triad motif census. The oracle hash-check is the authority; these
  * pin the semantic invariants a hash can't name when it fails.
  */
class SurfaceR12aSpec extends SparkSpec {

  private lazy val merged =
    queries.SurfaceR12a.q49MergeUpsert(spark, sfDir).cache()
  private lazy val census =
    queries.SurfaceR12a.lg14MotifCensus(spark, sfDir).cache()
  private lazy val target = Tables.orders(spark, sfDir)
    .select(col("o_orderkey"),
      expr("CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT)").as("qprice"))

  test("q49: merge keys stay unique") {
    assert(merged.count() === merged.select("o_orderkey").distinct().count())
  }

  test("q49: every MERGE branch took effect") {
    val t = target.cache()
    val nT = t.count()
    val nDel = t.where(col("o_orderkey") % 25 === 0).count()
    val nIns = t.where(col("o_orderkey") % 7 === 3).count()
    // deleted keys absent, inserted keys present, totals reconcile
    assert(merged.where(col("o_orderkey") % 25 === 0 &&
      col("o_orderkey") < 1000000000L).count() === 0)
    assert(merged.where(col("o_orderkey") >= 1000000000L).count() === nIns)
    assert(merged.count() === nT - nDel + nIns)
    // matched non-deleted keys carry the UPDATED price (+100.00)
    val upd = merged.where(col("o_orderkey") % 5 === 0 &&
        col("o_orderkey") < 1000000000L)
      .join(t, "o_orderkey")
      .where(merged("qprice") =!= t("qprice") + 1000000L)
    assert(upd.count() === 0)
    // untouched keys are bit-identical to the target
    val untouched = merged.where(col("o_orderkey") % 5 =!= 0 &&
        col("o_orderkey") < 1000000000L)
      .join(t, "o_orderkey")
      .where(merged("qprice") =!= t("qprice"))
    assert(untouched.count() === 0)
    t.unpersist()
  }

  test("q49: delete flag only acts on MATCHED rows") {
    // an insert row flagged del=true must still insert (ANSI MERGE:
    // the delete clause guards the MATCHED branch only)
    import spark.implicits._
    val t = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val s = Seq((2L, "b2", true), (9L, "new", true)).toDF("k", "v", "del")
    val out = operators.MergeUpsert.mergeUpsert(t, s, Seq("k"), Some("del"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "a"), (9L, "new")))
  }

  test("q49: validateUniqueKeys rejects duplicate source keys by count") {
    import spark.implicits._
    val t = Seq((1L, "a")).toDF("k", "v")
    val dup = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    // default: silent fan-out (documented contract) — 1 matched row
    // fans out to 2, plus the insert
    assert(operators.MergeUpsert.mergeUpsert(t, dup, Seq("k")).count() === 3)
    // opt-in ANSI behavior: throws, naming the duplicate count
    val e = intercept[IllegalArgumentException] {
      operators.MergeUpsert.mergeUpsert(t, dup, Seq("k"),
        validateUniqueKeys = true)
    }
    assert(e.getMessage.contains("1 duplicate merge-key"))
    // unique source passes validation unchanged
    val uniq = Seq((1L, "x"), (2L, "z")).toDF("k", "v")
    assert(operators.MergeUpsert.mergeUpsert(t, uniq, Seq("k"),
      validateUniqueKeys = true).count() === 2)
  }

  test("lg14: class counts partition the 2-paths") {
    val bad = census.where(
      col("n_open") + col("n_ffl") + col("n_cycle") + col("n_both")
        =!= col("n_paths"))
    assert(bad.count() === 0)
    assert(census.count() > 0)
  }

  test("lg14: out-degree 3 bounds per-middle paths by k*(k-1) minimum shape") {
    // every middle vertex has exactly 3 out-edges and at most 3 in-
    // edges contributing... in-degree varies, but paths through b =
    // indeg(b) * 3 minus self-returns; the hard invariant is paths > 0
    // only for vertices with at least one in-edge, and n_paths <= 3 *
    // indeg(b). Verify against the edge list directly.
    val dir = queries.SurfaceR6h.knnDirected(spark, sfDir)
    val indeg = dir.groupBy(col("dst").as("vec_id"))
      .agg(count(lit(1)).as("indeg"))
    val joined = census.join(indeg, "vec_id")
    assert(joined.where(col("n_paths") > col("indeg") * 3).count() === 0)
  }
}
