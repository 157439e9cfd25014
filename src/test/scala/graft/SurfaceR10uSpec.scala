package graft

import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{VectorAssembler, VectorIndexer}

import graft.queries.SurfaceR10u

class SurfaceR10uSpec extends SparkSpec {

  test("every R10u query runs at sf0.001") {
    SurfaceR10u.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m94: fitted categoryMaps really are ascending-value order") {
    // guards the oracle's linenumber-1 closed form: if VectorIndexer's
    // mapping convention ever changes, this fails before the oracle does
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_linenumber").cast("double").as("ln"), col("l_quantity").as("q"))
    val va = new VectorAssembler()
      .setInputCols(Array("ln", "q")).setOutputCol("f")
    val m = new VectorIndexer().setInputCol("f").setOutputCol("idx")
      .setMaxCategories(10).fit(va.transform(li))
    assert(m.categoryMaps.keySet == Set(0), "only dim 0 is categorical")
    val map0 = m.categoryMaps(0)
    val sorted = map0.keys.toSeq.sorted
    sorted.zipWithIndex.foreach { case (v, i) =>
      assert(map0(v) == i, s"value $v maps to ${map0(v)}, not rank $i")
    }
    assert(sorted == (1 to 7).map(_.toDouble))
  }

  test("m95: every even-id vertex with an edge is assigned; 4 nonempty clusters") {
    val rows = SurfaceR10u.m95PowerIteration(spark, sfDir).collect()
    val verts = graft.queries.SurfaceR6h.knnEdges(spark, sfDir)
      .select(explode(array(col("s"), col("t"))).as("v"))
      .distinct().count()
    assert(rows.length == verts, s"${rows.length} assigned of $verts")
    val clusters = rows.map(_.getInt(1)).distinct
    assert(clusters.length > 1 && clusters.length <= 4,
      s"unexpected cluster count: ${clusters.length}")
  }

  test("m95: MLlib PIC partitions the same graph (MLlib-parity law)") {
    // the registry row is the exact-replay native fit; MLlib's
    // PowerIterationClustering stays exercised here on the same edges
    val edges = graft.queries.SurfaceR6h.knnEdges(spark, sfDir)
      .select(col("s").as("src"), col("t").as("dst"), lit(1.0).as("weight"))
    val pic = new org.apache.spark.ml.clustering.PowerIterationClustering()
      .setK(4).setMaxIter(20).setInitMode("degree").setWeightCol("weight")
    val assigned = pic.assignClusters(edges).cache()
    val verts = graft.queries.SurfaceR6h.knnEdges(spark, sfDir)
      .select(explode(array(col("s"), col("t"))).as("v"))
      .distinct().count()
    assert(assigned.count() == verts, "MLlib PIC dropped vertices")
    val k = assigned.select("cluster").distinct().count()
    assert(k > 1 && k <= 4, s"MLlib PIC cluster count $k")
  }
}
