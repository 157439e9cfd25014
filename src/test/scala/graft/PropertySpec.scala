package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorFunctions

/** ScalaCheck property layer (SURVEY.md §5.1): algebraic laws that must
  * hold for any data, checked on generated inputs. Sampling is driven
  * directly off Gen (scalatestplus is not on the offline classpath).
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 10)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private val smallInts = Gen.listOfN(30, Gen.choose(0, 9))

  test("join algebra: semi = inner-project-distinct; anti = complement") {
    import spark.implicits._
    forAll(smallInts, smallInts) { (ls: List[Int], rs: List[Int]) =>
      val l = ls.zipWithIndex.toDF("k", "lv")
      val r = rs.zipWithIndex.toDF("k", "rv")
      val semi = l.join(r, Seq("k"), "left_semi").select("k", "lv")
      val viaInner = l.join(r.select("k").distinct(), Seq("k")).select("k", "lv")
      assert(semi.exceptAll(viaInner).count() == 0)
      assert(viaInner.exceptAll(semi).count() == 0)
      val anti = l.join(r, Seq("k"), "left_anti").select("k", "lv")
      assert(anti.count() + semi.count() == l.count())
      assert(anti.intersect(semi).count() == 0)
    }
  }

  test("union/except cardinality laws") {
    import spark.implicits._
    forAll(smallInts, smallInts) { (ls: List[Int], rs: List[Int]) =>
      val l = ls.toDF("k")
      val r = rs.toDF("k")
      assert(l.unionAll(r).count() == ls.size + rs.size)
      assert(l.exceptAll(r).count() + l.intersectAll(r).count() == ls.size)
    }
  }

  test("window top-k equals groupwise sorted take") {
    import spark.implicits._
    forAll(Gen.listOfN(40, Gen.zip(Gen.choose(0, 4), Gen.choose(0, 1000)))) {
      pairs: List[(Int, Int)] =>
        val df = pairs.zipWithIndex.map { case ((g, v), i) => (g, v, i) }
          .toDF("g", "v", "id")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("v").desc, col("id").asc)
        val topk = df.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3).select("g", "v", "id")
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
        val expected = pairs.zipWithIndex
          .map { case ((g, v), i) => (g, v, i) }
          .groupBy(_._1).values
          .flatMap(_.sortBy(t => (-t._2, t._3)).take(3)).toSet
        assert(topk == expected)
    }
  }

  test("dedup idempotence: distinct of distinct is distinct") {
    import spark.implicits._
    forAll(smallInts) { ls: List[Int] =>
      val df = ls.toDF("k")
      assert(df.distinct().count() == ls.distinct.size)
      assert(df.distinct().distinct().count() == ls.distinct.size)
    }
  }

  test("cosine: self-similarity 1, symmetry, scale invariance") {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.choose(-100, 100).map(_.toFloat))
      .suchThat(v => v.exists(_ != 0f))
    forAll(vecGen, vecGen, Gen.choose(1, 50)) {
      (a: List[Float], b: List[Float], s: Int) =>
        val df = Seq((a.toArray, b.toArray, a.map(_ * s).toArray))
          .toDF("a", "b", "a_scaled")
        val r = df.select(
          VectorFunctions.cosineSim(col("a"), col("a")),
          VectorFunctions.cosineSim(col("a"), col("b")),
          VectorFunctions.cosineSim(col("b"), col("a")),
          VectorFunctions.cosineSim(col("a_scaled"), col("b"))).head()
        assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
        assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12)
        assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-6)
    }
  }

  test("approx_count_distinct within the envelope — and the pinned flag agrees") {
    val r = graft.queries.Hardening.a3ApproxDistinct(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row => assert(row.getBoolean(2), row.toString) }
    // the envelope itself, recomputed directly (the query only emits the flag)
    val raw = Tables.orders(spark, sfDir).groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey")).as("a"),
        countDistinct(col("o_custkey")).as("e"))
      .collect()
    raw.foreach { row =>
      val (approx, exact) = (row.getLong(1), row.getLong(2))
      assert(math.abs(approx - exact) <= math.max(2, exact * 0.10), row.toString)
    }
  }

  test("percentile_approx within its guaranteed rank-error band — flag agrees") {
    val r = graft.queries.Hardening.a9ApproxPercentile(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row => assert(row.getBoolean(2), row.toString) }
    val raw = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("a"),
        expr("percentile(l_extendedprice, 0.5)").as("e"))
      .collect()
    raw.foreach { row =>
      val (approx, exact) = (row.getDouble(1), row.getDouble(2))
      assert(math.abs(approx - exact) / exact < 0.02, row.toString)
    }
  }

  test("sortWithinPartitions orders every partition locally") {
    val sorted = Tables.lineitem(spark, sfDir)
      .repartition(4, col("l_returnflag"))
      .sortWithinPartitions("l_extendedprice")
      .select("l_extendedprice")
    val violations = sorted.mapPartitions { it =>
      var prev = Double.MinValue
      var bad = 0
      it.foreach { r =>
        val v = r.getDouble(0)
        if (v < prev) bad += 1
        prev = v
      }
      Iterator(bad)
    }(org.apache.spark.sql.Encoders.scalaInt).collect().sum
    assert(violations == 0)
  }

  test("session_window matches hand-computed gaps-and-islands on random data") {
    import spark.implicits._
    val gapSec = 600
    forAll(Gen.listOfN(60, Gen.zip(Gen.choose(1, 3), Gen.choose(0L, 86400L))), 5) {
      events: List[(Int, Long)] =>
        val df = events.map { case (u, s) =>
          (u.toLong, new java.sql.Timestamp(1704067200000L + s * 1000))
        }.toDF("user_id", "ts")
        val spark_ = df
          .groupBy(session_window(col("ts"), s"$gapSec seconds"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), unix_timestamp(col("session_window.start")).as("start_s"), col("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val expected = events
          .map { case (u, s) => (u.toLong, 1704067200L + s) }
          .groupBy(_._1).flatMap { case (u, rows) =>
            val ts = rows.map(_._2).sorted
            val sessions = ts.foldLeft(List.empty[List[Long]]) { (acc, t) =>
              acc match {
                case (cur @ (last :: _)) :: rest if t - last < gapSec =>
                  (t :: cur) :: rest
                case _ => List(t) :: acc
              }
            }
            sessions.map(sess => (u, sess.min, sess.size.toLong))
          }.toSet
        assert(spark_ == expected, s"spark=$spark_ expected=$expected")
    }
  }

  test("topKByScore aggregate equals the window row_number route on random data") {
    import org.scalacheck.Gen
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.choose(1, 200)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0, 8)
        score <- Gen.choose(0, 50).map(_.toDouble) // collisions likely → ties exercised
      } yield (key.toLong, score))
      k <- Gen.choose(1, 5)
      parts <- Gen.choose(1, 6)
    } yield (rows.zipWithIndex.map { case ((key, s), i) => (key, s, i.toLong) }, k, parts)
    forAll(gen) { case (rows, k, parts) =>
      val df = spark.createDataset(
        spark.sparkContext.parallelize(rows, parts)).toDF("key", "score", "id")
      val viaAgg = df.groupBy("key")
        .agg(org.apache.spark.sql.graft.TopKByScore.topK(col("score"), col("id"), k).as("top"))
        .select(col("key"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("key"), col("e.tie").as("id"), col("e.score").as("score"),
          (col("pos") + 1).as("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
      val viaWindow = df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(1), r.getInt(3))).toSet
      assert(viaAgg == viaWindow, s"agg=$viaAgg window=$viaWindow")
    }
  }

  test("Misra-Gries: every term with freq > n/(capacity+1) survives any partitioning") {
    import org.scalacheck.Gen
    import spark.implicits._
    val gen = for {
      nTerms <- Gen.choose(5, 40)
      weights <- Gen.listOfN(nTerms, Gen.choose(1, 120))
      parts <- Gen.choose(1, 8)
    } yield (weights, parts)
    forAll(gen) { case (weights, parts) =>
      val capacity = 8
      val rows = weights.zipWithIndex.flatMap { case (w, i) => Seq.fill(w)(s"t$i") }
      val n = rows.size
      val df = spark.createDataset(
        spark.sparkContext.parallelize(rows, parts)).toDF("tok")
      val kept = df.agg(
        org.apache.spark.sql.graft.HeavyHitters.topK(col("tok"), capacity, capacity).as("hh"))
        .select(explode(col("hh")).as("e")).select("e.term").as[String]
        .collect().toSet
      val mustSurvive = weights.zipWithIndex.collect {
        case (w, i) if w > n.toDouble / (capacity + 1) => s"t$i"
      }
      mustSurvive.foreach { t =>
        assert(kept.contains(t),
          s"$t (freq ${weights(t.drop(1).toInt)}, n=$n, cap=$capacity, parts=$parts) evicted; kept=$kept")
      }
    }
  }
}
