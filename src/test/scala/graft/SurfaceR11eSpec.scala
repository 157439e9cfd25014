package graft

import org.apache.spark.sql.functions._

import graft.queries.{SurfaceR11a, SurfaceR11e, SurfaceR6h}

class SurfaceR11eSpec extends SparkSpec {

  test("every R11e query runs at sf0.001") {
    SurfaceR11e.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lg13: level 2 refines level 1 (never splits a level-1 community)") {
    val l1 = SurfaceR11a.queries("lg12_louvain")(spark, sfDir)
      .withColumnRenamed("community", "c1")
    val l2 = SurfaceR11e.queries("lg13_louvain_l2")(spark, sfDir)
      .withColumnRenamed("community", "c2")
    val both = l1.join(l2, "vec_id").localCheckpoint(true)
    // every level-1 community maps to exactly one level-2 community
    val split = both.groupBy("c1")
      .agg(countDistinct("c2").as("n2")).where(col("n2") > 1).count()
    assert(split == 0, s"$split level-1 communities were split by level 2")
    // and the partition can only get coarser or stay
    val n1 = both.select("c1").distinct().count()
    val n2 = both.select("c2").distinct().count()
    assert(n2 <= n1, s"level 2 has MORE communities: $n2 > $n1")
  }

  test("lg13: modularity does not drop below level 1") {
    def modularity(assign: org.apache.spark.sql.DataFrame): Double = {
      val und = SurfaceR6h.knnEdges(spark, sfDir).localCheckpoint(true)
      val m = und.count()
      val adj = und.union(und.select(col("t").as("s"), col("s").as("t")))
      val deg = adj.groupBy(col("s").as("v")).agg(count(lit(1)).as("deg"))
      val dc = assign.join(deg, assign("vec_id") === deg("v"))
        .groupBy("community").agg(sum("deg").as("dc"))
      val intra = und
        .join(assign.select(col("vec_id").as("s"), col("community").as("ca")), "s")
        .join(assign.select(col("vec_id").as("t"), col("community").as("cb")), "t")
        .where(col("ca") === col("cb"))
        .groupBy(col("ca").as("community")).agg(count(lit(1)).as("ec"))
      val qnum = dc.join(intra, Seq("community"), "left")
        .agg(sum(lit(4L) * m * coalesce(col("ec"), lit(0L))
          - col("dc") * col("dc")).as("q")).head.getLong(0)
      qnum.toDouble / (4.0 * m * m)
    }
    val q1 = modularity(SurfaceR11a.queries("lg12_louvain")(spark, sfDir)
      .localCheckpoint(true))
    val q2 = modularity(SurfaceR11e.queries("lg13_louvain_l2")(spark, sfDir)
      .localCheckpoint(true))
    // guaranteed by the integer acceptance check: the level-2 labelling
    // ships only when its modularity numerator strictly beats level 1's
    assert(q2 >= q1 - 1e-12, s"level 2 lost modularity: $q2 < $q1")
  }
}
