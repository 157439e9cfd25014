package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchAggs

/** Laws for the DataSketches typed aggregates (a35/a36). The registry
  * keys check against the rank definition / exact set algebra with
  * tolerance flags; these pin the mechanisms — merge correctness
  * across partitions, theta EXACTNESS below nominal entries, set-op
  * identities — on inputs where truth is computable.
  */
class SketchAggsSpec extends SparkSpec {

  test("kll: quantiles of a known uniform sequence hit their ranks") {
    import spark.implicits._
    // 1..10000 across 8 partitions — forces partial-agg merges
    val df = spark.range(1, 10001).repartition(8)
      .select(col("id").cast("double").as("v"))
    val qs = df.agg(SketchAggs.kllQuantiles(col("v"), 200,
      Seq(0.1, 0.5, 0.9)).as("qs"))
      .collect()(0).getSeq[Double](0)
    val targets = Seq(1000.0, 5000.0, 9000.0)
    qs.zip(targets).foreach { case (est, t) =>
      // k=200 rank error ~1.65%; allow 3% of the 10k range
      assert(math.abs(est - t) <= 300.0, s"quantile $est vs $t")
    }
  }

  test("kll: empty input evals to an empty array, not a throw") {
    import spark.implicits._
    val qs = Seq.empty[Double].toDF("v")
      .agg(SketchAggs.kllQuantiles(col("v"), 200, Seq(0.5)).as("qs"))
      .collect()(0).getSeq[Double](0)
    assert(qs.isEmpty)
  }

  test("theta: exact below nominal entries; set algebra identities hold") {
    import spark.implicits._
    // A = {0..999}, B = {500..1499}: |A|=|B|=1000, |A∩B|=500, |A∖B|=500
    // — all below 2^12 nominal, so theta retains every hash: EXACT.
    val a = spark.range(0, 1000).repartition(4)
      .agg(SketchAggs.thetaSketch(col("id"), 12)).collect()(0).getAs[Array[Byte]](0)
    val b = spark.range(500, 1500).repartition(4)
      .agg(SketchAggs.thetaSketch(col("id"), 12)).collect()(0).getAs[Array[Byte]](0)
    assert(SketchAggs.thetaEstimate(a) === 1000.0)
    assert(SketchAggs.thetaEstimate(b) === 1000.0)
    assert(SketchAggs.thetaIntersectEstimate(a, b) === 500.0)
    assert(SketchAggs.thetaDifferenceEstimate(a, b) === 500.0)
    // identities: A∩A = A, A∖A = ∅
    assert(SketchAggs.thetaIntersectEstimate(a, a) === 1000.0)
    assert(SketchAggs.thetaDifferenceEstimate(a, a) === 0.0)
  }

  test("theta: grouped sketches merge duplicates away (set semantics)") {
    import spark.implicits._
    // every key appears 3 times; distinct count is what the sketch sees
    val df = (1 to 300).map(i => (i % 2, (i % 100).toLong)).toDF("g", "k")
      .repartition(4)
    val rows = df.groupBy("g").agg(SketchAggs.thetaSketch(col("k"), 12).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(SketchAggs.thetaEstimate(rows(0)) === 50.0) // even residues
    assert(SketchAggs.thetaEstimate(rows(1)) === 50.0)
  }
}
