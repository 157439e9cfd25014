package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoinNative
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOfJoin

class AsOfJoinNativeSpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 10)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  test("native as-of join equals the union+window route on the events fixture") {
    val e = Tables.events(spark, sfDir)
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.where(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val cols = Seq("event_id", "user_id", "click_ts", "click_value")
    val native = AsOfJoinNative.backward(
      purchases, clicks, Seq("user_id"), "ts", "ts", "click_")
      .select(cols.head, cols.tail: _*)
    val window = AsOfJoin.backward(
      purchases, clicks, Seq("user_id"), "ts", "ts", "click_")
      .select(cols.head, cols.tail: _*)
    assert(native.count() == purchases.count())
    assert(native.exceptAll(window).count() == 0 &&
      window.exceptAll(native).count() == 0)
  }

  test("native as-of join plans one exchange + sort per side, no window") {
    val e = Tables.events(spark, sfDir)
    val l = e.where(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val r = e.where(col("event_type") === "click").select("user_id", "ts", "value")
    val df = AsOfJoinNative.backward(l, r, Seq("user_id"), "ts", "ts")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin ["), s"custom exec not planned:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into native plan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected one hash exchange per side:\n$plan")
  }

  test("no-match rows carry nulls, not zeros") {
    import spark.implicits._
    val l = Seq((0L, 9L, 5L), (1L, 1L, 5L), (2L, 1L, 1L)).toDF("id", "k", "t")
    val r = Seq((1L, 3L, 7.0), (1L, 9L, 9.0)).toDF("k", "t", "v")
    val rows = AsOfJoinNative.backward(l, r, Seq("k"), "t", "t")
      .select("id", "asof_t", "asof_v").orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2), s"k=9 has no right rows: ${rows(0)}")
    assert(rows(1).getLong(1) == 3L && rows(1).getDouble(2) == 7.0, rows(1).toString)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2),
      s"k=1 t=1 precedes all right rows: ${rows(2)}")
  }

  test("AQE coalescing cannot misalign the merge-scan sides (asymmetric sizes, skew)") {
    // The exec pairs children with zipPartitions under ClusteredDistribution.
    // EnsureRequirements co-partitions multi-child ClusteredDistribution
    // operators via the ShuffleSpec compatibility machinery, and AQE's
    // CoalesceShufflePartitions coalesces all shuffles that feed one stage
    // with a SINGLE shared spec list — this test pins both behaviors with
    // the adversarial shape: a left side big enough to coalesce into many
    // partitions, a right side tiny enough to coalesce into one if the
    // sides were (wrongly) decided independently, plus a 90%-hot key.
    import spark.implicits._
    val conf = spark.conf
    val touched = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val saved = touched.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16kb")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1kb")
      val l = (0 until 20000).map { i =>
        (i.toLong, if (i % 10 < 9) 0L else (i % 97).toLong, (i % 1000).toLong)
      }.toDF("id", "k", "t")
      val r = (0 until 40).map { i =>
        ((i % 5).toLong, (i * 20).toLong, i.toDouble)
      }.toDF("k", "t", "v")
      val cols = Seq("id", "k", "t", "asof_t", "asof_v")
      val native = AsOfJoinNative.backward(l, r, Seq("k"), "t", "t")
        .select(cols.head, cols.tail: _*)
      val window = AsOfJoin.backward(l, r, Seq("k"), "t", "t")
        .select(cols.head, cols.tail: _*)
      assert(native.count() == 20000L)
      assert(native.exceptAll(window).count() == 0 &&
        window.exceptAll(native).count() == 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("pre-partitioned children with mismatched partition counts still align") {
    // Both children individually satisfy ClusteredDistribution(k) at 13
    // and 4 partitions — a naive zipPartitions would throw or misalign;
    // EnsureRequirements must re-shuffle to a common partitioning.
    import spark.implicits._
    val l = (0 until 500).map(i => (i.toLong, (i % 7).toLong, (i % 50).toLong))
      .toDF("id", "k", "t").repartition(13, col("k"))
    val r = (0 until 100).map(i => ((i % 9).toLong, (i % 40).toLong, i.toDouble))
      .toDF("k", "t", "v").repartition(4, col("k"))
    val cols = Seq("id", "k", "t", "asof_t", "asof_v")
    val native = AsOfJoinNative.backward(l, r, Seq("k"), "t", "t")
      .select(cols.head, cols.tail: _*)
    val window = AsOfJoin.backward(l, r, Seq("k"), "t", "t")
      .select(cols.head, cols.tail: _*)
    assert(native.count() == 500L)
    assert(native.exceptAll(window).count() == 0 &&
      window.exceptAll(native).count() == 0)
  }

  test("native as-of join equals the window route on random data (with ties and misses)") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(0, 60)
      nr <- Gen.choose(0, 60)
      lrows <- Gen.listOfN(nl, for {
        k <- Gen.choose(0, 4); t <- Gen.choose(0, 30)
      } yield (k.toLong, t.toLong))
      rrows <- Gen.listOfN(nr, for {
        k <- Gen.choose(0, 6); t <- Gen.choose(0, 30); v <- Gen.choose(0, 999)
      } yield (k.toLong, t.toLong, v.toDouble))
    } yield (lrows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }, rrows)
    forAll(gen) { case (lrows, rrowsRaw) =>
      // duplicate right (k, t) rows are tie-broken arbitrarily by BOTH
      // routes (same contract) — dedupe so the comparison is exact
      val rrows = rrowsRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val l = lrows.toDF("id", "k", "t").repartition(3)
      val r = rrows.toDF("k", "t", "v").repartition(2)
      val native = AsOfJoinNative.backward(l, r, Seq("k"), "t", "t")
        .select("id", "k", "t", "asof_t", "asof_v")
      val window = AsOfJoin.backward(l, r, Seq("k"), "t", "t")
        .select("id", "k", "t", "asof_t", "asof_v")
      val a = native.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val b = window.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(a == b, s"native=$a window=$b")
    }
  }
}
