package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.queries.SurfaceR9

class SurfaceR9Spec extends SparkSpec {

  private def blobs(n: Int = 300, seed: Int = 11) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array(Array(5.0, 5.0), Array(-5.0, 5.0), Array(0.0, -5.0))
    (0 until n).map { i =>
      val k = i % 3
      val f = centers(k).map(c => (c + rnd.nextGaussian() * 0.5).toFloat)
      (i.toLong, k.toDouble, f)
    }.toDF("id", "label", "arr")
      .select(col("id"), col("label"), array_to_vector(col("arr")).as("features"))
  }

  test("every R9 query runs at sf0.001") {
    SurfaceR9.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m36: imputed values equal the non-null mean, others untouched") {
    val out = SurfaceR9.m36Imputer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal").cast("double").as("bal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val survivors = base.filter { case (k, _) => k % 7 != 0 }
    val mu = survivors.values.sum / survivors.size
    base.foreach { case (k, bal) =>
      val expect = if (k % 7 == 0) mu else bal
      assert(math.abs(out(k) - expect) < 1e-3, s"custkey $k: ${out(k)} vs $expect")
    }
  }

  test("m36 median strategy: fill value is an actual order statistic near p50") {
    // median-strategy Imputer uses the approx-percentile sketch — the
    // law is rank-accuracy, not bit-equality, which is why the REGISTRY
    // entry pins the oracle-able mean strategy instead
    val base = Tables.customer(spark, sfDir).select(
      col("c_custkey"),
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal"))
        .cast("double").as("bal"))
    val imp = new org.apache.spark.ml.feature.Imputer()
      .setStrategy("median").setInputCol("bal").setOutputCol("filled")
    val fill = imp.fit(base).surrogateDF.collect()(0).getDouble(0)
    val vals = base.where(col("bal").isNotNull)
      .collect().map(_.getDouble(1)).sorted
    assert(vals.contains(fill), "median surrogate must be a data point")
    val rank = vals.indexOf(fill).toDouble / vals.length
    assert(math.abs(rank - 0.5) < 0.01, s"median surrogate at rank $rank")
  }

  test("m37: one-vs-rest beats the majority-class baseline on embeddings") {
    val conf = SurfaceR9.m37Onevsrest(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val total = conf.map(_._3).sum.toDouble
    val correct = conf.filter(c => c._1 == c._2).map(_._3).sum.toDouble
    val majority = conf.groupBy(_._1).map(_._2.map(_._3).sum).max.toDouble
    assert(correct / total > majority / total,
      s"OvR accuracy ${correct / total} not above majority ${majority / total}")
  }

  test("m37: one-vs-rest separates gaussian blobs (acc > 0.95)") {
    val df = blobs()
    val ovr = new org.apache.spark.ml.classification.OneVsRest()
      .setClassifier(new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(25))
      .setFeaturesCol("features").setLabelCol("label")
    val acc = graft.ml.Pipelines.accuracy(ovr.fit(df).transform(df))
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("m38: GMM weights sum to 1 and recover 3 well-separated blobs") {
    val df = blobs()
    val gm = new org.apache.spark.ml.clustering.GaussianMixture()
      .setK(3).setSeed(42L).fit(df)
    assert(math.abs(gm.weights.sum - 1.0) < 1e-6)
    // purity: each cluster dominated by one true label
    val assigns = gm.transform(df).groupBy("prediction", "label").count()
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val purity = assigns.groupBy(_._1).values
      .map(rows => rows.map(_._3).max.toDouble / rows.map(_._3).sum).min
    assert(purity > 0.95, s"min cluster purity $purity")
  }

  test("m39: bisecting k-means is deterministic under refit and covers the corpus") {
    val a = SurfaceR9.m39BisectingKmeans(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = SurfaceR9.m39BisectingKmeans(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a == b, "same seed must give same occupancy")
    assert(a.values.sum == Tables.embeddings(spark, sfDir).count())
    assert(a.keySet.max < 8)
  }

  test("m41/m42: lattice laws — anti-monotone freqs, rules consistent with itemsets") {
    val items = SurfaceR9.m41Fpgrowth(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val singles = items.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    val pairs = items.filter(_._1 == 2)
    assert(singles.nonEmpty && pairs.nonEmpty)
    // anti-monotonicity: a pair can never be more frequent than either member
    pairs.foreach { case (_, key, f) =>
      val Array(x, y) = key.split(",")
      assert(f <= singles(x) && f <= singles(y), s"$key freq $f")
    }
    // every rule's confidence must equal pairFreq/antecedentFreq (4dp)
    val rules = SurfaceR9.m42AssocRules(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rules.nonEmpty)
    rules.foreach { case (ant, cons, conf) =>
      val key = if (ant < cons) s"$ant,$cons" else s"$cons,$ant"
      val pf = pairs.find(_._2 == key).map(_._3).getOrElse(0L)
      assert(pf > 0, s"rule $ant->$cons has no frequent pair")
      assert(math.abs(conf - pf.toDouble / singles(ant)) < 1e-3,
        s"$ant->$cons conf $conf vs ${pf.toDouble / singles(ant)}")
    }
  }

  test("m43: sequential supports are anti-monotone in their prefix items") {
    val pats = SurfaceR9.m43Prefixspan(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val singles = pats.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    val twos = pats.filter(_._1 == 2)
    assert(singles.nonEmpty && twos.nonEmpty)
    twos.foreach { case (_, p, f) =>
      val Array(x, y) = p.split(">")
      assert(f <= singles(x) && f <= singles(y), s"$p freq $f")
    }
  }

  test("m44: PCA variance ratios are positive, descending, and sum <= 1") {
    val ev = SurfaceR9.m44Pca(spark, sfDir).collect().map(_.getDouble(1))
    assert(ev.length == 4)
    assert(ev.forall(_ > 0))
    assert(ev.sameElements(ev.sorted.reverse))
    assert(ev.sum <= 1.0 + 1e-9)
  }

  test("m45: word2vec synonyms exclude the probe word, sims in [-1,1], deterministic") {
    val a = SurfaceR9.m45Word2vec(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(a.length == 3)
    assert(a.forall { case (_, s) => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9 })
    val b = SurfaceR9.m45Word2vec(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(a.sameElements(b), "same seed must give same synonyms")
  }

  test("m46: KS statistic equals a driver-side exact recomputation") {
    val row = SurfaceR9.m46KsTest(spark, sfDir).collect()(0)
    val (n, m, d) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val vals = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag").isin("A", "R"))
      .select("l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "A").map(_._2).sorted
    val b = vals.filter(_._1 == "R").map(_._2).sorted
    assert(n == a.length && m == b.length)
    val points = (a ++ b).distinct.sorted
    val dExact = points.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length
        - b.count(_ <= v).toDouble / b.length)
    }.max
    assert(math.abs(d - dExact) < 1e-3, s"KS $d vs exact $dExact")
  }

  test("m47: U statistic equals a driver-side midrank recomputation, AUC in [0,1]") {
    val row = SurfaceR9.m47Mannwhitney(spark, sfDir).collect()(0)
    val (n, m, u2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val vals = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag").isin("A", "R"))
      .select("l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val all = vals.map(_._2).sorted
    // exact midranks via first/last occurrence in the sorted pool
    def midrank2(v: Double): Long = { // doubled midrank, exact integer
      val lo = all.indexWhere(_ == v); val hi = all.lastIndexWhere(_ == v)
      (lo + 1).toLong + (hi + 1).toLong
    }
    val r2 = vals.filter(_._1 == "A").map(t => midrank2(t._2)).sum
    val nA = vals.count(_._1 == "A").toLong
    val nB = vals.count(_._1 == "R").toLong
    assert(n == nA && m == nB)
    assert(u2 == r2 - nA * (nA + 1), s"u2 $u2 vs ${r2 - nA * (nA + 1)}")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("x16: recursive traversal depth histogram equals floor(log2(key))") {
    val rows = SurfaceR9.x16RecursiveCte(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val keys = Tables.part(spark, sfDir).select("p_partkey")
      .collect().map(_.getLong(0))
    // partkey 0 (present in the fixture) is unreachable from root 1 —
    // its would-be parent is itself — so the walk must exclude it
    val expect = keys.filter(_ >= 1)
      .map(k => (math.log(k.toDouble) / math.log(2.0)).toInt)
      .groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    assert(rows == expect, s"got $rows expected $expect")
  }

  test("lt13: changepoint maximizes |n*pre - k*tot| in a driver-side replay") {
    val got = SurfaceR9.lt13CusumChangepoint(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val rows = Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS us", "event_id",
        "CAST(floor(value * 1e4 + 5e-1) AS BIGINT) AS q")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (et, es) =>
      val sorted = es.sortBy(t => (t._2, t._3))
      val n = sorted.length.toLong
      val tot = sorted.map(_._4).sum
      var pre = 0L; var best = -1L; var bestK = 0L
      sorted.zipWithIndex.foreach { case ((_, _, _, q), i) =>
        pre += q
        val t = math.abs(n * pre - (i + 1) * tot)
        if (t > best) { best = t; bestK = i + 1 }
      }
      assert(got(et) == (bestK, best), s"$et: ${got(et)} vs ($bestK, $best)")
    }
  }

  test("m50: no kept token is in the stop list; removal is case-insensitive") {
    val stops = org.apache.spark.ml.feature.StopWordsRemover
      .loadDefaultStopWords("english").toSet
    val kept = SurfaceR9.m50StopWords(spark, sfDir)
      .where(col("first_kept").isNotNull)
      .collect().map(_.getString(2))
    assert(kept.nonEmpty)
    kept.foreach(w => assert(!stops.contains(w.toLowerCase), s"stop word '$w' kept"))
  }

  test("s19: partitioned JDBC read splits into 4 parallel range queries") {
    val df = SurfaceR9.s19JdbcRoundtrip(spark, sfDir)
    assert(df.count() == 25)
    // the scan itself (before the orderBy exchange) must carry the 4
    // range partitions — JDBCRelation prints its partition count
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("JDBCRelation") && scan.contains("numPartitions=4"),
      s"partitioned JDBC scan missing:\n$scan")
  }

  test("m40: LDA topics are 3, term ranks dense, weights descending") {
    val topics = SurfaceR9.m40Lda(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(topics.map(_._1).distinct.sorted.toSeq == Seq(0, 1, 2))
    topics.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3, 4))
    }
  }
}
