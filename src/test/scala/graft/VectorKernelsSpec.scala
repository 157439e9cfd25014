package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorKernelsSpec extends SparkSpec {
  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (3L, Array(1f, 2f, 2f), Array(2f, 4f, 4f)),
      (4L, Array(0f, 0f, 0f), Array(1f, 1f, 1f)),
      (5L, Array(1f, -1f, 0f), Array(-1f, 1f, 0f)),
    ).toDF("id", "a", "b")
  }

  test("cosineSim: identical, orthogonal, parallel, zero, opposite") {
    val rows = df.select(col("id"), cosineSim(col("a"), col("b")).as("c"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows(1L) - 1.0) < 1e-12)
    assert(rows(2L) == 0.0)
    assert(math.abs(rows(3L) - 1.0) < 1e-12)
    assert(rows(4L) == 0.0) // zero-norm convention
    assert(math.abs(rows(5L) + 1.0) < 1e-12)
  }

  test("length mismatch yields NULL in both codegen and interpreted eval") {
    import spark.implicits._
    // min-length silent results would let the norm-hoist optimizer rule
    // change answers (r02 ADVICE) — mismatches must be NULL everywhere
    val m = Seq(
      (1L, Array(1f, 2f), Array(1f, 2f, 3f)),
      (2L, Array(0f, 0f), Array(0f, 0f, 0f)), // zero norm AND mismatch
      (3L, Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
    ).toDF("id", "a", "b")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val rows = m.select(col("id"),
          cosineSim(col("a"), col("b")).as("c"),
          dotProduct(col("a"), col("b")).as("d"))
          .orderBy("id").collect()
        assert(rows(0).isNullAt(1) && rows(0).isNullAt(2), s"$mode: ${rows(0)}")
        assert(rows(1).isNullAt(1) && rows(1).isNullAt(2), s"$mode: ${rows(1)}")
        assert(!rows(2).isNullAt(1) && rows(2).getDouble(2) == 14.0)
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("norm-hoist join rewrite agrees with the kernel on mismatched lengths") {
    import spark.implicits._
    val l = Seq((1L, Array(1f, 2f)), (2L, Array(0f, 0f)), (3L, Array(1f, 0f, 0f)))
      .toDF("a_id", "a_emb")
    val r = Seq((10L, Array(1f, 2f, 3f)), (11L, Array(2f, 0f, 0f)))
      .toDF("b_id", "b_emb")
    // join condition triggers CosineNormRewrite; a projection of the same
    // call does not — both must produce the same surviving pair set
    val viaJoin = l.join(r, cosineSim(col("a_emb"), col("b_emb")) > 0.5)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val viaFilter = l.crossJoin(r)
      .where(cosineSim(col("a_emb"), col("b_emb")) > 0.5)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(viaJoin == viaFilter)
    assert(viaJoin == Set((3L, 11L))) // only the equal-length parallel pair
  }

  test("dotProduct and l2Norm match hand math") {
    val r = df.where(col("id") === 3)
      .select(dotProduct(col("a"), col("b")), l2Norm(col("a")), l2Norm(col("b")))
      .head()
    assert(r.getDouble(0) == 2.0 + 8.0 + 8.0)
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 6.0)
  }

  test("interpreted eval matches codegen on fixture embeddings") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val a = e.select(col("vec_id").as("ai"), col("embedding").as("ae"))
    val b = e.select(col("vec_id").as("bi"), col("embedding").as("be"))
    val pairs = a.join(b, col("ai") < col("bi"))
      .select(cosineSim(col("ae"), col("be")).as("c"))
    // codegen path
    val fromCodegen = pairs.agg(sum("c")).head().getDouble(0)
    // force interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val fromInterp =
      try pairs.agg(sum("c")).head().getDouble(0)
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(math.abs(fromCodegen - fromInterp) < 1e-9)
    // self-similarity is exactly 1 for non-zero vectors
    val selfs = a.select(cosineSim(col("ae"), col("ae")).as("c"))
      .where(col("c") < 0.9999999999).count()
    assert(selfs == 0)
  }

  test("multiple kernel instances fuse into one codegen stage without fallback") {
    // Regression (r01): fixed local names in doGenCode made janino reject
    // the fused class ("Redefinition of local variable i") and the stage
    // silently ran interpreted. factoryMode=CODEGEN_ONLY turns that
    // silent fallback into a hard failure.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = df.where(col("id") === 3).select(
        cosineSim(col("a"), col("b")).as("c1"),
        cosineSim(col("b"), col("a")).as("c2"),
        dotProduct(col("a"), col("b")).as("d1"),
        dotProduct(col("b"), col("a")).as("d2"),
        l2Norm(col("a")).as("n1"),
        l2Norm(col("b")).as("n2"))
        .head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == 18.0 && r.getDouble(3) == 18.0)
      assert(r.getDouble(4) == 3.0 && r.getDouble(5) == 6.0)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }
}
