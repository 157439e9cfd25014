package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10

class SurfaceR10Spec extends SparkSpec {

  test("every R10 query runs at sf0.001") {
    SurfaceR10.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m36b: imputed values equal the exact median of survivors") {
    val out = SurfaceR10.m36bImputerMedian(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal").cast("double").as("bal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val survivors = base.collect { case (k, v) if k % 7 != 0 => v }.toSeq.sorted
    // Imputer(relativeError=0) median = an ELEMENT of the data at the
    // middle rank; accept either middle element for even counts.
    val mids = if (survivors.size % 2 == 1) Seq(survivors(survivors.size / 2))
      else Seq(survivors(survivors.size / 2 - 1), survivors(survivors.size / 2))
    val filled = out.collect { case (k, v) if k % 7 == 0 => v }.toSet
    assert(filled.size == 1)
    assert(mids.exists(m => math.abs(filled.head - m) < 1e-3),
      s"fill ${filled.head} not a middle element of $mids")
    base.foreach { case (k, bal) =>
      if (k % 7 != 0) assert(math.abs(out(k) - bal) < 1e-3)
    }
  }

  test("m45b: sharded Word2Vec has the same vocabulary as the 1-partition fit") {
    val docs = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("words"))
    def fit(parts: Int) = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("words").setOutputCol("vec")
      .setVectorSize(16).setMinCount(2).setNumPartitions(parts)
      .setSeed(42L).setMaxIter(1).fit(docs)
    val v1 = fit(1).getVectors.select("word").collect().map(_.getString(0)).toSet
    val v4 = fit(4).getVectors.select("word").collect().map(_.getString(0)).toSet
    assert(v1 == v4, s"vocab diverged: ${(v1 diff v4).take(5)} / ${(v4 diff v1).take(5)}")
    assert(v1.nonEmpty)
  }

  test("m45b: sharded synonyms overlap the seeded 1-partition synonyms") {
    val docs = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("words"))
    val top = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count().orderBy(col("count").desc, col("w")).limit(1)
      .collect()(0).getString(0)
    def syns(parts: Int) = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("words").setOutputCol("vec")
      .setVectorSize(16).setMinCount(2).setNumPartitions(parts)
      .setSeed(42L).setMaxIter(1).fit(docs)
      .findSynonyms(top, 10).select("word").collect().map(_.getString(0)).toSet
    // Different partition counts race different update orders: exact
    // equality is not expected, but the top-10 neighbor sets of the
    // most frequent token must share ground — an empty intersection
    // means the sharded fit learned nothing comparable.
    val inter = syns(1) intersect syns(4)
    assert(inter.nonEmpty, "no overlap between sharded and 1-partition synonyms")
  }

  test("x17: TABLESAMPLE REPEATABLE is reproducible and seed-sensitive") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_r10s_orders")
    def sample(seed: Int) =
      spark.sql(s"""SELECT o_orderkey FROM graft_r10s_orders
                   |TABLESAMPLE (20 PERCENT) REPEATABLE ($seed)""".stripMargin)
        .collect().map(_.getLong(0)).toSet
    val s42a = sample(42); val s42b = sample(42); val s7 = sample(7)
    assert(s42a == s42b, "same seed must give the same sample")
    assert(s42a != s7, "different seeds should give different samples")
    val n = Tables.orders(spark, sfDir).count()
    assert(s42a.size > n / 10 && s42a.size < n * 3 / 10,
      s"20% sample of $n rows returned ${s42a.size}")
  }

  test("x18: freqItems result equals the exact frequent-item set") {
    val out = SurfaceR10.x18FreqItems(spark, sfDir).collect()
      .map(r => r.getString(0)).toSet
    val o = Tables.orders(spark, sfDir)
    val n = o.count()
    val exact = o.groupBy("o_orderpriority").count()
      .where(col("count") * 5 > n)
      .collect().map(_.getString(0)).toSet
    assert(out == exact, s"$out vs $exact")
  }

  test("m53: TVS picks the low regParam on separable blobs") {
    // The registry entry runs on the fixtures (rows-only); the LAW needs
    // data where selection is forced: on well-separated Gaussian blobs
    // the 10.0 candidate crushes the model to the prior and must lose.
    // (At sf0.001 the fixture's ~12-row validation split is too small to
    // make that guarantee, which is why the law doesn't run on it.)
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array(Array(6.0, 6.0), Array(-6.0, 6.0), Array(0.0, -6.0))
    val blobs = (0 until 300).map { i =>
      val k = i % 3
      (k.toDouble, centers(k).map(c => c + rnd.nextGaussian() * 0.4))
    }.toDF("label", "arr")
      .select(col("label"), array_to_vector(col("arr")).as("features"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(10).setFeaturesCol("features").setLabelCol("label")
    val grid = new org.apache.spark.ml.tuning.ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 10.0)).build()
    val tvs = new org.apache.spark.ml.tuning.TrainValidationSplit()
      .setEstimator(lr)
      .setEvaluator(new org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator()
        .setLabelCol("label").setPredictionCol("prediction")
        .setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setTrainRatio(0.75).setSeed(42L)
    val best = tvs.fit(blobs).bestModel
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    assert(best.getRegParam == 0.01, s"TVS chose ${best.getRegParam}")
  }

  test("lt14: merge rounds are monotone non-increasing and replay-exact") {
    val rows = SurfaceR10.lt14BpeMerges(spark, sfDir).collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"merge counts increased: ${counts.mkString(",")}")
    // driver-side replay of round 1 on the raw corpus: the first merge
    // must be the globally most frequent adjacent character pair
    val wc = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    wc.foreach { case (w, n) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + n
      }
    }
    val (bx, by) = pairCounts.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.head._1
    assert(rows(0).getString(1) == s"$bx $by",
      s"round-1 merge ${rows(0).getString(1)} != replay $bx $by")
    assert(rows(0).getLong(2) == pairCounts((bx, by)))
  }
}
