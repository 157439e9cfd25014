package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.queries.{SurfaceR6g, SurfaceR6h, SurfaceR6i}

/** Laws for round-6 waves 4–6 (aggregate surface, graph ops, geo join,
  * feature math). Oracle hash-compares live in the driver; these pin the
  * properties the oracles can't see (tie-uniqueness, recall-by-
  * construction parity, accuracy bounds).
  */
class SurfaceR6gSpec extends SparkSpec {

  test("A22: the per-group price extremes are unique, so min_by/max_by are deterministic") {
    val li = Tables.lineitem(spark, sfDir)
    val ext = li.groupBy("l_returnflag")
      .agg(max("l_extendedprice").as("mx"), min("l_extendedprice").as("mn"))
    val hits = li.join(ext, "l_returnflag")
      .where(col("l_extendedprice") === col("mx") || col("l_extendedprice") === col("mn"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(hits.collect().forall(_.getLong(1) == 2L))
  }

  test("A23: listagg emits each group's names in sorted order") {
    val rows = SurfaceR6g.a23Listagg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val names = r.getString(1).split(',').toSeq
      assert(names == names.sorted)
      assert(names.size == r.getLong(2))
    }
  }

  test("A25: regr_slope agrees with covar_pop/var_pop") {
    val li = Tables.lineitem(spark, sfDir)
    val both = li.groupBy("l_returnflag")
      .agg(covar_pop(col("l_extendedprice"), col("l_quantity")).as("cv"),
        var_pop(col("l_quantity")).as("vp"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("sl"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(1) / r.getDouble(2) - r.getDouble(3)) < 1e-6)
    }
  }

  test("A26: median equals exact percentile 0.5") {
    val li = Tables.lineitem(spark, sfDir)
    val rows = li.groupBy("l_returnflag")
      .agg(median(col("l_quantity")).as("m"),
        percentile(col("l_quantity"), lit(0.5)).as("p"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12))
  }

  test("F24: mask leaves no letters or digits behind") {
    val rows = SurfaceR6g.f24Mask(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getString(1)
      assert(!m.exists(c => c.isDigit || (c.isLetter && !"Xxn".contains(c))))
    }
  }

  test("LG2: oriented three-way join counts exactly the brute-force triangles") {
    val tri = SurfaceR6h.lg2Triangles(spark, sfDir)
      .agg(sum("n_triangles")).collect()(0).getLong(0)
    // Brute force on the collected edge list (test-only collect; the
    // fixture graph is ~500 edges). Each triangle contributes one common
    // neighbor to each of its three edges, so Σ|N(a)∩N(b)| = 3T — which
    // is also what the per-vertex counts sum to.
    val es = SurfaceR6h.knnEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = (es ++ es.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val commonSum = es.toSeq.map { case (a, b) =>
      (adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty)).size.toLong
    }.sum
    assert(commonSum % 3 == 0)
    assert(tri == commonSum, s"per-vertex sum $tri != 3T = $commonSum")
    assert(tri > 0, "fixture kNN graph should contain triangles")
  }

  test("LG3: BFS distances are a fixpoint (each level-k vertex has a level-k-1 neighbor)") {
    val dist = SurfaceR6h.lg3Bfs(spark, sfDir)
    val rows = dist.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty && rows.values.exists(_ == 0) && rows.values.forall(d => d >= 0 && d <= 4))
    val es = SurfaceR6h.knnEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (es ++ es.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    rows.foreach { case (v, d) =>
      if (d > 0)
        assert(adj(v).exists(u => rows.get(u).exists(_ == d - 1)),
          s"vertex $v at dist $d has no neighbor at ${d - 1}")
    }
  }

  test("T15: EWMA starts at the first observation and stays inside the prefix envelope") {
    val rows = SurfaceR6h.t15Ewma(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
      .orderBy("user_id", "day").collect()
      .groupBy(_.getLong(0))
    rows.groupBy(_.getLong(0)).foreach { case (uid, rs) =>
      val vs = daily(uid).map(_.getDouble(2))
      val sorted = rs.sortBy(_.getDate(1).toString)
      assert(math.abs(sorted.head.getDouble(2) - vs.head) < 1e-3)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val prefix = vs.take(i + 1)
        assert(r.getDouble(2) >= prefix.min - 1e-3 && r.getDouble(2) <= prefix.max + 1e-3)
      }
    }
  }

  test("L15: unigram log-probs are negative and token counts conserve the corpus") {
    val out = SurfaceR6h.l15UnigramLogprob(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) < 0.0))
    val total = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " "))).count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("J12: grid-bucketed geo join equals the brute-force radius join (recall 1.0)") {
    val grid = SurfaceR6i.j12GeoJoin(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val brute = {
      import org.apache.spark.sql.Column
      def nibble(k: String, p: Int) =
        expr(s"(instr('0123456789abcdef', substr(md5(cast($k as string)), $p, 1)) - 1)")
      def lat(k: String): Column = (nibble(k, 1) * 16 + nibble(k, 2)) * 0.35 - 44.8
      def lon(k: String): Column = (nibble(k, 3) * 16 + nibble(k, 4)) * 0.7 - 89.6
      val c = cust.select(col("c_custkey"), lat("c_custkey").as("clat"), lon("c_custkey").as("clon"))
      val s2 = supp.select(col("s_suppkey"), lat("s_suppkey").as("slat"), lon("s_suppkey").as("slon"))
      val dlat = radians(col("clat") - col("slat")) / 2.0
      val dlon = radians(col("clon") - col("slon")) / 2.0
      s2.crossJoin(c)
        .withColumn("dist", lit(2.0 * 6371.0) * asin(sqrt(
          pow(sin(dlat), 2.0) +
            cos(radians(col("slat"))) * cos(radians(col("clat"))) * pow(sin(dlon), 2.0))))
    }
    val inside = brute.where(col("dist") < 500.0)
      .select(col("s_suppkey"), col("c_custkey"))
    val got = grid.select(col("s_suppkey"), col("c_custkey"))
    assert(got.exceptAll(inside).count() == 0 && inside.exceptAll(got).count() == 0)
    // Boundary margin: closest miss/hit sits well away from the threshold,
    // so cross-engine float noise cannot flip membership.
    val margin = brute.agg(min(abs(col("dist") - 500.0))).collect()(0).getDouble(0)
    assert(margin > 0.01, s"boundary margin $margin km too small")
  }

  test("J12/LG2: candidate generation plans as equi-joins — no cartesian product, no BNLJ") {
    Seq(
      graft.queries.SurfaceR6i.j12GeoJoin(spark, sfDir),
      graft.queries.SurfaceR6h.lg2Triangles(spark, sfDir)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), "unexpected cartesian product")
      // the only broadcast-nested-loop allowed anywhere near these ops is
      // the kNN builder's bounded O(n²) stand-in, which lg2 keeps behind
      // the edge cache; the triangle/radius joins themselves must be
      // hash- or merge-based equi-joins
      assert(plan.contains("Join"), "expected join operators in plan")
    }
    val geoPlan = graft.queries.SurfaceR6i.j12GeoJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!geoPlan.contains("BroadcastNestedLoop"),
      "geo radius join must bucket, never nested-loop")
  }

  test("M23: the full normalized vector has unit L2 norm") {
    val nz = Tables.embeddings(spark, sfDir)
      .where(expr("aggregate(embedding, 0D, (a, x) -> a + cast(x as double) * cast(x as double))") > 0)
      .withColumn("v", array_to_vector(col("embedding")))
    val norm = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("v").setOutputCol("nv").setP(2.0)
    val sq = norm.transform(nz)
      .withColumn("arr", org.apache.spark.ml.functions.vector_to_array(col("nv")))
      .select(expr("aggregate(arr, 0D, (a, x) -> a + x * x)").as("sq"))
      .collect()
    assert(sq.nonEmpty)
    sq.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("M24: Word2Vec vectors are 16-dim with positive norm") {
    val rows = SurfaceR6i.m24Word2vec(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == 16)
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("M25: GBT separates gaussian blobs (acc > 0.95)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array(Array(4.0, 4.0), Array(-4.0, -4.0))
    val df = (0 until 300).map { i =>
      val k = i % 2
      val f = centers(k).map(c => (c + rnd.nextGaussian() * 0.5).toFloat)
      (i.toLong, k.toDouble, f)
    }.toDF("id", "label", "arr")
      .select(col("id"), col("label"), array_to_vector(col("arr")).as("features"))
    val gbt = new org.apache.spark.ml.classification.GBTClassifier()
      .setMaxIter(10).setMaxDepth(3).setSeed(42L)
      .setFeaturesCol("features").setLabelCol("label")
    val preds = gbt.fit(df).transform(df)
    assert(graft.ml.Pipelines.accuracy(preds) > 0.95)
  }
}
