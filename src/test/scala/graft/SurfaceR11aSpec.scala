package graft

import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.CountVectorizer
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}

import graft.queries.SurfaceR11a

class SurfaceR11aSpec extends SparkSpec {

  test("every R11a query runs at sf0.001") {
    SurfaceR11a.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m200: model transform counts equal the relational counts") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val model = new CountVectorizer().setInputCol("toks").setOutputCol("tf")
      .setMinDF(2.0).setVocabSize(1 << 18).fit(docs)
    val vocab = model.vocabulary
    // vector-space transform, exploded back to (doc_id, term, tf)
    val dense = model.transform(docs)
      .select(col("doc_id"), posexplode(vector_to_array(col("tf"))))
      .where(col("col") > 0)
      .collect()
      .map(r => (r.getLong(0), vocab(r.getInt(1)), r.getDouble(2).toLong))
      .toSet
    val relational = SurfaceR11a.queries("m200_count_vectorizer")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(dense == relational,
      s"transform/relational disagree: ${dense.size} vs ${relational.size}")
  }

  test("m200: vocabulary is ordered by non-increasing corpus frequency") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val model = new CountVectorizer().setInputCol("toks").setOutputCol("tf")
      .setMinDF(2.0).setVocabSize(1 << 18).fit(docs)
    val counts = docs.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val freqs = model.vocabulary.map(counts)
    freqs.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"vocabulary frequency order violated: $a < $b")
    }
  }

  private def r2Of(scored: org.apache.spark.sql.DataFrame): Double = {
    val ybar = scored.agg(avg("y")).head.getDouble(0)
    val r = scored.agg(
      sum(pow(col("prediction") - col("y"), 2)).as("ssr"),
      sum(pow(col("y") - lit(ybar), 2)).as("sst")).head
    1.0 - r.getDouble(0) / r.getDouble(1)
  }

  test("m201/m202: regressors recover the label-coded target (R² law)") {
    val feats = graft.ml.Pipelines
      .embeddingFeatures(Tables.embeddings(spark, sfDir))
      .withColumn("y", col("label"))
    val rf = new RandomForestRegressor().setLabelCol("y")
      .setFeaturesCol("features").setNumTrees(20).setMaxDepth(5).setSeed(42L)
    val rfR2 = r2Of(rf.fit(feats).transform(feats))
    assert(rfR2 > 0.3, s"RF regressor R² $rfR2 below floor")
    val gbt = new GBTRegressor().setLabelCol("y")
      .setFeaturesCol("features").setMaxIter(10).setMaxDepth(3).setSeed(42L)
    val gbtR2 = r2Of(gbt.fit(feats).transform(feats))
    assert(gbtR2 > 0.3, s"GBT regressor R² $gbtR2 below floor")
  }

  test("lg12: local move finds positive modularity, beating singletons") {
    val und = graft.queries.SurfaceR6h.knnEdges(spark, sfDir)
      .localCheckpoint(true)
    val lab = SurfaceR11a.queries("lg12_louvain")(spark, sfDir)
      .localCheckpoint(true)
    val m = und.count()
    val adj = und.union(und.select(col("t").as("s"), col("s").as("t")))
    val deg = adj.groupBy(col("s").as("v")).agg(count(lit(1)).as("deg"))
    def q(assign: org.apache.spark.sql.DataFrame): Double = {
      val dc = assign.join(deg, assign("vec_id") === deg("v"))
        .groupBy("community").agg(sum("deg").as("dc"))
      val intra = und
        .join(assign.select(col("vec_id").as("s"), col("community").as("ca")), "s")
        .join(assign.select(col("vec_id").as("t"), col("community").as("cb")), "t")
        .where(col("ca") === col("cb"))
        .groupBy(col("ca").as("community")).agg(count(lit(1)).as("ec"))
      val sums = dc.join(intra, Seq("community"), "left")
        .agg(sum(lit(4L) * m * coalesce(col("ec"), lit(0L))
          - col("dc") * col("dc")).as("qnum")).head
      sums.getLong(0).toDouble / (4.0 * m * m)
    }
    val qLouvain = q(lab)
    val singles = deg.select(col("v").as("vec_id"), col("v").as("community"))
    val qSingles = q(singles)
    assert(qLouvain > qSingles,
      s"local move did not improve modularity: $qLouvain <= $qSingles")
    assert(qLouvain > 0.0, s"modularity $qLouvain not positive")
    // fewer communities than vertices: moves actually happened
    val nc = lab.select("community").distinct().count()
    assert(nc < deg.count(), s"no merges: $nc communities")
  }
}
