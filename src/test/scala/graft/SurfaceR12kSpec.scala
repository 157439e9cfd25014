package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 11: k-truss peeling. */
class SurfaceR12kSpec extends SparkSpec {

  test("lg15: edge census shrinks monotonically and support stays consistent") {
    val out = queries.SurfaceR12k.lg15Ktruss(spark, sfDir)
      .orderBy("round").collect()
    assert(out.length === 4)
    val edges = out.map(_.getAs[Long]("n_edges"))
    assert(edges.sliding(2).forall { case Array(a, b) => b <= a },
      s"edge census must be non-increasing: ${edges.mkString(",")}")
    assert(edges(0) > 0)
    // support_sum counts each triangle's edge incidences: bounded by
    // n_edges * maxdeg; and zero edges => zero support
    out.foreach { r =>
      if (r.getAs[Long]("n_edges") === 0L)
        assert(r.getAs[Long]("support_sum") === 0L)
    }
  }

  test("lg15: a clique survives peeling, a path dies (hand graph)") {
    import spark.implicits._
    // K4 clique (every edge has support 2) + a pendant 3-path (support 0)
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val e = (clique ++ path).toDF("s", "t")
    val und = e.select(col("s").as("a"), col("t").as("b"))
      .union(e.select(col("t").as("a"), col("s").as("b")))
    val sup = e.join(und.toDF("xa", "xb"), col("xa") === col("s"))
      .join(und.toDF("ya", "yb"), col("ya") === col("t") && col("yb") === col("xb"))
      .groupBy("s", "t").agg(count(lit(1)).as("c"))
    val kept = sup.where(col("c") >= 2).select("s", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === clique.toSet, "exactly the K4 edges must survive one peel")
  }
}
