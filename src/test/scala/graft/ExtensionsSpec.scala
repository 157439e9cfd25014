package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExtensions

import graft.operators.{Similarity, SkewJoin}

class ExtensionsSpec extends SparkSpec {

  test("kernels registered via extensions are callable from plain SQL") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sfDir).limit(20).createOrReplaceTempView("emb_ext")
    val rows = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, a.embedding) AS self_cos,
        |       l2_norm(a.embedding) AS nrm,
        |       dot_product(a.embedding, a.embedding) AS sq
        |FROM emb_ext a""".stripMargin).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(2) * r.getDouble(2) - r.getDouble(3)) < 1e-6)
    }
  }

  test("injector class wires all functions into SparkSessionExtensions") {
    val ext = new SparkSessionExtensions
    new org.apache.spark.sql.graft.GraftExtensions()(ext)
    // registration is observable through the live-session path above;
    // here we only assert the injector accepts the extension point
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("bloom_agg", "bloom_might_contain", "cosine_sim",
        "damerau_levenshtein", "dot_product", "explode_ngrams",
        "heavy_hitters", "jaro_winkler", "l2_norm", "top_k_by_score"))
  }

  test("custom aggregates are callable from plain SQL") {
    GraftExtensions.register(spark)
    Tables.orders(spark, sfDir).createOrReplaceTempView("ord_ext")
    val top = spark.sql(
      """SELECT o_custkey, top_k_by_score(o_totalprice, o_orderkey, 2) AS top
        |FROM ord_ext GROUP BY o_custkey ORDER BY o_custkey LIMIT 1""".stripMargin)
      .selectExpr("o_custkey", "inline(top)").collect()
    assert(top.length >= 1 && top.length <= 2)
    val hh = spark.sql(
      """SELECT heavy_hitters(o_orderpriority, 16, 3) AS hh FROM ord_ext""")
      .selectExpr("inline(hh)").collect()
    assert(hh.length == 3)
  }

  test("non-literal capacity/k arguments fail analysis with a clear error") {
    GraftExtensions.register(spark)
    Tables.orders(spark, sfDir).createOrReplaceTempView("ord_ext2")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT heavy_hitters(o_orderpriority, o_custkey, 3) FROM ord_ext2""")
        .collect()
    }
    assert(e1.getMessage.contains("heavy_hitters") &&
      e1.getMessage.contains("capacity"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT o_custkey, top_k_by_score(o_totalprice, o_orderkey, o_custkey)
          |FROM ord_ext2 GROUP BY o_custkey""".stripMargin).collect()
    }
    assert(e2.getMessage.contains("top_k_by_score"), e2.getMessage)
  }

  test("explode_ngrams Generator: plan shows custom Generate, matches L8 route") {
    GraftExtensions.register(spark)
    val viaGen = graft.queries.LlmOps.queries("lx_explode_ngrams")(spark, sfDir)
    assert(viaGen.queryExecution.executedPlan.toString.contains("explode_ngrams"),
      "custom Generate not in plan")
    val viaL8 = graft.queries.LlmOps.queries("l8_ngrams")(spark, sfDir)
    val a = viaGen.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = viaL8.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b, s"generator route diverges from L8: ${a.diff(b).take(3)}")
  }

  test("explode_ngrams edge cases: null text, short text, n<=0, trigram") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq(Some("a b c d"), Some("a"), Some(""), None)
      .toDF("text").createOrReplaceTempView("ngram_edge")
    val tri = spark.sql(
      "SELECT explode_ngrams(text, 3) AS g FROM ngram_edge")
      .collect().map(_.getString(0))
    assert(tri.toSeq == Seq("a b c", "b c d")) // only the 4-token row emits
    val zero = spark.sql("SELECT explode_ngrams(text, 0) AS g FROM ngram_edge")
    assert(zero.count() == 0)
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT explode_ngrams(text, length(text)) FROM ngram_edge").collect()
    }
    assert(bad.getMessage.toLowerCase.contains("literal"), bad.getMessage)
  }

  test("CosineNormRewrite hoists norms below the join and preserves results exactly") {
    val q9 = graft.queries.Relational.q9CosineSelfjoin(spark, sfDir)
    val optimized = q9.queryExecution.optimizedPlan.toString
    // norms projected once per row, not once per pair
    assert(optimized.contains("_graft_norm"), s"rewrite did not fire:\n$optimized")
    assert(optimized.contains("dot_product"), s"no dot_product in plan:\n$optimized")
    val joinCondLine = optimized.linesIterator.find(_.contains("Join Inner")).getOrElse("")
    assert(!joinCondLine.contains("cosine_sim"),
      s"cosine_sim still evaluated per pair in join condition:\n$optimized")

    // exact parity with the un-rewritten plan
    val withRule = q9.collect()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.graft.CosineNormRewrite")
    try {
      val q9Plain = graft.queries.Relational.q9CosineSelfjoin(spark, sfDir)
      assert(!q9Plain.queryExecution.optimizedPlan.toString.contains("_graft_norm"))
      val withoutRule = q9Plain.collect()
      assert(withRule.toSeq == withoutRule.toSeq,
        s"rewrite changed results: ${withRule.length} vs ${withoutRule.length} rows")
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("saltedJoin returns exactly the plain join result") {
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val salted = SkewJoin.saltedJoin(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      "l_orderkey", "o_orderkey", "l_linenumber", saltFactor = 5)
      .groupBy("o_orderpriority").count()
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("ivfTopK recall >= 0.8 vs brute force on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val centroids = Array.fill(6)(Array.fill(16)(rnd.nextGaussian().toFloat * 10))
    val vecs = (0 until 180).map { i =>
      val c = centroids(i % 6)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, df, 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(df, 5, nlist = 6, nprobe = 2)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }
}
