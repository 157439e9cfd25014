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
