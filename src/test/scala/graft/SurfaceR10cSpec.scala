package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10c

class SurfaceR10cSpec extends SparkSpec {

  test("every R10c query runs at sf0.001") {
    SurfaceR10c.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m66: selection equals the per-dim var_samp cut") {
    val kept = SurfaceR10c.m66VarianceThreshold(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val vars = Tables.embeddings(spark, sfDir)
      .select((0 until 8).map(i =>
        var_samp(element_at(col("embedding"), i + 1).cast("double"))
          .as(s"v$i")): _*)
      .collect()(0)
    val exp = (0 until 8).filter(i => vars.getDouble(i) > 0.0155)
      .map(_.toLong).toSet
    assert(kept == exp, s"$kept vs $exp")
  }

  test("m67: spearman is invariant under monotone transformation") {
    // rank correlation of (d1, d2) must equal that of (exp(d1), d2):
    // computed through the same MLlib path, a strictly increasing map
    // of one variable cannot change any rank.
    def rho(c1: org.apache.spark.sql.Column) = {
      val df = Tables.embeddings(spark, sfDir).select(
        array_to_vector(array(c1,
          element_at(col("embedding"), 2).cast("double"))).as("v"))
      org.apache.spark.ml.stat.Correlation.corr(df, "v", "spearman")
        .head.getAs[org.apache.spark.ml.linalg.Matrix](0)(0, 1)
    }
    val base = rho(element_at(col("embedding"), 1).cast("double"))
    val mono = rho(exp(element_at(col("embedding"), 1).cast("double")))
    assert(math.abs(base - mono) < 1e-9, s"$base vs $mono")
  }

  test("m68: poisson/log with intercept preserves the total count") {
    // canonical-link score equation: sum(fitted) = sum(observed)
    val counts = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(count(lit(1)).cast("double").as("y"))
    val base = Tables.customer(spark, sfDir)
      .join(counts, col("c_custkey") === col("o_custkey"))
      .select(col("y"), (col("c_acctbal") / 1000.0).as("x"))
    val va = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x")).setOutputCol("features")
    val glr = new org.apache.spark.ml.regression.GeneralizedLinearRegression()
      .setFamily("poisson").setLink("log").setRegParam(0.0).setMaxIter(50)
      .setFeaturesCol("features").setLabelCol("y")
    val feats = va.transform(base)
    val m = glr.fit(feats)
    val sums = m.transform(feats)
      .agg(sum("y").as("obs"), sum("prediction").as("fit")).collect()(0)
    val (obs, fit) = (sums.getDouble(0), sums.getDouble(1))
    assert(math.abs(obs - fit) / obs < 1e-6, s"sum(fitted) $fit vs sum(y) $obs")
  }

  test("m69: AFT quantile predictions are monotone in probability") {
    val base = Tables.orders(spark, sfDir).select(
      (col("o_totalprice") / 1000.0).as("label"),
      when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("censor"),
      month(col("o_orderdate")).cast("double").as("m"))
    val va = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("m")).setOutputCol("features")
    val aft = new org.apache.spark.ml.regression.AFTSurvivalRegression()
      .setFeaturesCol("features").setLabelCol("label").setCensorCol("censor")
      .setQuantileProbabilities(Array(0.1, 0.5, 0.9))
      .setQuantilesCol("q")
    val m = aft.fit(va.transform(base))
    assert(!m.intercept.isNaN && !m.scale.isNaN && m.scale > 0)
    val qs = m.transform(va.transform(base))
      .select(col("q")).limit(10).collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0).toArray)
    qs.foreach { q =>
      assert(q(0) <= q(1) && q(1) <= q(2),
        s"quantiles not monotone: ${q.mkString(",")}")
    }
  }

  test("m70: FMClassifier separates blobs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val pts = (0 until 200).map { i =>
      val lab = i % 2
      val c = if (lab == 0) -3.0 else 3.0
      (lab.toDouble, Array(c + rnd.nextGaussian(), c + rnd.nextGaussian()))
    }.toDF("label", "arr")
      .select(col("label"), array_to_vector(col("arr")).as("features"))
    val m = new org.apache.spark.ml.classification.FMClassifier()
      .setFactorSize(2).setMaxIter(50).setSeed(42L).setStepSize(0.1)
      .setFeaturesCol("features").setLabelCol("label").fit(pts)
    val acc = m.transform(pts)
      .where(col("prediction") === col("label")).count() / 200.0
    assert(acc >= 0.9, s"FM accuracy $acc")
  }

  test("lm2: sampled frames replay exactly against a driver-side recompute") {
    val out = SurfaceR10c.lm2FrameSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getString(3)))
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var checked = 0
    docs.foreach { case (id, text) =>
      val nf = text.length / 64
      (0 until nf).filter(_ % 4 == 0).foreach { i =>
        val frame = text.substring(i * 64, i * 64 + 64)
        val crop = text.substring(i * 64, i * 64 + 16)
        assert(out((id, i.toLong)) == ((md5hex(frame), md5hex(crop))),
          s"frame fingerprint mismatch at doc $id frame $i")
        checked += 1
      }
    }
    assert(checked > 0 && out.size == checked)
    assert(out.keys.forall(_._2 % 4 == 0), "non-sampled frame leaked")
  }

  test("q33: SCD2 intervals tile each user's timeline without overlap") {
    val rows = SurfaceR10c.q33Scd2Build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_._5 == 1L) == 1)
      assert(sorted.last._5 == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"interval gap/overlap: ${a._4} vs ${b._3}")
          assert(a._2 != b._2, "consecutive intervals must change type")
        case _ =>
      }
    }
  }
}
