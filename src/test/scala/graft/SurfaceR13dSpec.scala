package graft

import org.apache.spark.sql.functions._

/** Laws for round-13 batch 4: the cross-document repeated-span
  * detector. The oracle hash-check is the authority at fixture scale;
  * these pin the span algebra on crafted corpora where the expected
  * spans are computable by hand — maximality (adjacent/overlapping
  * gram hits merge into ONE span), exactness of extents, and the
  * within-document-only-repeat negative case.
  */
class SurfaceR13dSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13d_").toString
    QueryGuard.deleteRecOnExit(new java.io.File(dir))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    queries.SurfaceR13d.lt85CrossdocSpans(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("lt85: a shared 7-token run yields ONE maximal span covering it exactly") {
    // tokens 2..8 of doc 0 == tokens 0..6 of doc 1 (7 tokens, K=5 →
    // 3 gram starts each, overlapping → one island)
    val shared = "s1 s2 s3 s4 s5 s6 s7"
    val spans = run(Seq(
      (0L, s"a0 a1 $shared a9 a10"),
      (1L, s"$shared b7 b8 b9 b10 b11")))
    assert(spans.toSet === Set(
      (0L, 2L, 8L, 3L),  // covers tokens 2..8 = the shared run, exactly
      (1L, 0L, 6L, 3L)))
  }

  test("lt85: two separated shared runs stay two islands") {
    val s1 = "x1 x2 x3 x4 x5"
    val s2 = "y1 y2 y3 y4 y5"
    // doc 0 carries both runs separated by >K unique tokens; docs 1/2
    // each share one run
    val spans = run(Seq(
      (0L, s"$s1 u1 u2 u3 u4 u5 u6 $s2"),
      (1L, s"$s1 v1 v2 v3 v4 v5 v6 v7"),
      (2L, s"w1 w2 w3 w4 w5 w6 w7 $s2")))
    val doc0 = spans.filter(_._1 == 0L).sortBy(_._2)
    assert(doc0 === Seq((0L, 0L, 4L, 1L), (0L, 11L, 15L, 1L)))
  }

  test("lt85: a run repeated only WITHIN one document is not flagged") {
    val rep = "r1 r2 r3 r4 r5"
    val spans = run(Seq(
      (0L, s"$rep m1 m2 m3 m4 m5 m6 $rep"),
      (1L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12")))
    // gram df counts DISTINCT documents — both occurrences live in doc
    // 0, so df=1 and nothing is flagged
    assert(spans.isEmpty)
  }
}
