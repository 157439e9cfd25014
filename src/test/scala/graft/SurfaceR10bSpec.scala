package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10b

class SurfaceR10bSpec extends SparkSpec {

  test("every R10b query runs at sf0.001") {
    SurfaceR10b.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("s20: XML roundtrip is the identity on the nation projection") {
    val back = SurfaceR10b.s20XmlFile(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    val orig = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy("n_nationkey").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(back.toSeq == orig.toSeq)
  }

  test("f27: to_xml/from_xml roundtrip preserves every orders row") {
    val n = Tables.orders(spark, sfDir).count()
    val rt = SurfaceR10b.f27XmlFuncs(spark, sfDir)
    assert(rt.count() == n)
    assert(rt.where(col("o_orderkey").isNull ||
      col("o_orderpriority").isNull).count() == 0)
  }

  test("m60: GLR gaussian/identity equals the closed-form OLS slope") {
    val row = SurfaceR10b.m60GlrGaussian(spark, sfDir).collect()(0)
    val (slope, intercept) = (row.getDouble(0), row.getDouble(1))
    val stats = Tables.lineitem(spark, sfDir).agg(
      covar_pop(col("l_quantity"), col("l_extendedprice")).as("cxy"),
      var_pop(col("l_quantity")).as("vx"),
      avg(col("l_extendedprice")).as("my"),
      avg(col("l_quantity")).as("mx")).collect()(0)
    val expSlope = stats.getDouble(0) / stats.getDouble(1)
    val expIcpt = stats.getDouble(2) - expSlope * stats.getDouble(3)
    assert(math.abs(slope - expSlope) < 1e-3, s"$slope vs $expSlope")
    assert(math.abs(intercept - expIcpt) < 1e-2, s"$intercept vs $expIcpt")
  }

  test("lt15: redacted output contains no residual email or phone match") {
    val out = SurfaceR10b.lt15PiiRedact(spark, sfDir)
    val residual = out.where(
      col("redacted").rlike("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""") ||
        col("redacted").rlike("""555-[0-9]{4}""")).count()
    assert(residual == 0)
    // every constructed message carries exactly one email and one phone
    assert(out.where(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
    assert(out.where(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<PHONE>")).count() == 0)
  }

  test("m61: LinearSVC separates parity blobs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (0 until 200).map { i =>
      val lab = i % 2
      val c = if (lab == 0) -4.0 else 4.0
      (lab.toDouble, Array(c + rnd.nextGaussian(), c + rnd.nextGaussian()))
    }.toDF("label", "arr")
      .select(col("label"), array_to_vector(col("arr")).as("features"))
    val m = new org.apache.spark.ml.classification.LinearSVC()
      .setMaxIter(20).setRegParam(0.01)
      .setFeaturesCol("features").setLabelCol("label").fit(pts)
    val acc = m.transform(pts)
      .where(col("prediction") === col("label")).count() / 200.0
    assert(acc >= 0.95, s"LinearSVC accuracy $acc")
  }

  test("m62: MLP learns separable 3-class blobs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val centers = Array(Array(5.0, 0.0), Array(-5.0, 5.0), Array(0.0, -5.0))
    val pts = (0 until 300).map { i =>
      val k = i % 3
      (k.toDouble, centers(k).map(_ + rnd.nextGaussian() * 0.5))
    }.toDF("label", "arr")
      .select(col("label"), array_to_vector(col("arr")).as("features"))
    val m = new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
      .setLayers(Array(2, 8, 3)).setMaxIter(60).setSeed(42L)
      .setFeaturesCol("features").setLabelCol("label").fit(pts)
    val acc = m.transform(pts)
      .where(col("prediction") === col("label")).count() / 300.0
    assert(acc >= 0.9, s"MLP accuracy $acc")
  }

  test("m63: FeatureHasher is deterministic and bounded by numFeatures") {
    val a = SurfaceR10b.m63FeatureHasher(spark, sfDir).collect()
    val b = SurfaceR10b.m63FeatureHasher(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "hashing must be run-stable")
    a.foreach { r =>
      val (nnz, idxSum) = (r.getLong(1), r.getLong(2))
      assert(nnz >= 1 && nnz <= 2, s"nnz $nnz for 2 input cols")
      assert(idxSum >= 0 && idxSum <= 63L + 62L)
    }
  }

  test("m64: inverse DCT recovers the input") {
    val base = Tables.embeddings(spark, sfDir).select(
      col("vec_id"), array_to_vector(slice(col("embedding"), 1, 8)).as("v"))
    val fwd = new org.apache.spark.ml.feature.DCT()
      .setInputCol("v").setOutputCol("c").setInverse(false)
    val inv = new org.apache.spark.ml.feature.DCT()
      .setInputCol("c").setOutputCol("back").setInverse(true)
    val rt = inv.transform(fwd.transform(base))
      .select(col("vec_id"), col("v"), col("back")).collect()
    rt.foreach { r =>
      val x = r.getAs[org.apache.spark.ml.linalg.Vector]("v").toArray
      val y = r.getAs[org.apache.spark.ml.linalg.Vector]("back").toArray
      x.zip(y).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5, s"idct(dct(x)) diverged: $a vs $b")
      }
    }
  }

  test("m65: decision tree fits separable blobs near-perfectly") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val centers = Array(Array(6.0, 0.0), Array(-6.0, 6.0), Array(0.0, -6.0))
    val pts = (0 until 300).map { i =>
      val k = i % 3
      (k.toDouble, centers(k).map(_ + rnd.nextGaussian() * 0.4))
    }.toDF("label", "arr")
      .select(col("label"), array_to_vector(col("arr")).as("features"))
    val m = new org.apache.spark.ml.classification.DecisionTreeClassifier()
      .setMaxDepth(5).setSeed(42L)
      .setFeaturesCol("features").setLabelCol("label").fit(pts)
    val acc = m.transform(pts)
      .where(col("prediction") === col("label")).count() / 300.0
    assert(acc >= 0.95, s"DecisionTree accuracy $acc")
  }
}
