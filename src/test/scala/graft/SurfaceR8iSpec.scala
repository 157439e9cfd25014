package graft

import org.apache.spark.sql.functions._

import graft.operators.PrefixSum
import graft.queries.SurfaceR8i

class SurfaceR8iSpec extends SparkSpec {
  import spark.implicits._

  test("prefix sum: standalone plan is internally consistent (resample regression)") {
    // The bug this guards: offsets and local ranks each re-evaluating
    // repartitionByRange with DIFFERENT sampled boundaries, so the
    // collected running totals are not the prefix sums of their own
    // rows (observed on m32 before the eager localCheckpoint). The
    // property below is exactly what failed.
    val e = Tables.events(spark, sfDir).select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val byV = e.groupBy("value").agg(count(lit(1)).as("nv"))
    val got = PrefixSum.withRunningTotal(byV, Seq("value"), "nv", 16, "rt")
      .select("value", "nv", "rt").as[(Double, Long, Long)].collect()
      .sortBy(_._1)
    var acc = 0L
    got.foreach { case (v, nv, rt) =>
      acc += nv
      assert(rt == acc, s"at v=$v: rt=$rt want=$acc")
    }
  }

  test("m32: AUC equals a driver-side rank-sum replay with tie handling") {
    val got = SurfaceR8i.m32RocAuc(spark, sfDir)
      .as[(Long, Long, Double)].collect().head
    val rows = Tables.events(spark, sfDir)
      .select(col("value"), (col("event_type") === "purchase").as("y"))
      .as[(Double, Boolean)].collect()
    val byV = rows.groupBy(_._1).map { case (v, g) =>
      (v, g.length.toLong, g.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    var cum = 0L; var s2 = 0L
    byV.foreach { case (_, nv, posv) =>
      s2 += posv * (2 * cum + nv + 1); cum += nv
    }
    val npos = byV.map(_._3).sum
    val nneg = byV.map(_._2).sum - npos
    val auc = (s2 - npos * (npos + 1)).toDouble / (2.0 * npos * nneg)
    val want = math.floor(auc * 1e4 + 0.5) / 1e4
    assert(got == ((npos, nneg, want)), s"$got vs ($npos,$nneg,$want)")
    // value is ~unrelated to the purchase label, so AUC ~ 0.5
    assert(got._3 > 0.4 && got._3 < 0.6)
  }

  test("a31: weighted median splits the weight mass per flag") {
    val got = SurfaceR8i.a31WeightedMedian(spark, sfDir)
      .as[(String, Double, Long)].collect()
    assert(got.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        expr("CAST(floor(l_quantity + 5e-1) AS BIGINT)").as("w"))
      .as[(String, Double, Long)].collect()
    got.foreach { case (flag, med, wtot) =>
      val fl = li.filter(_._1 == flag)
      assert(fl.map(_._3).sum == wtot)
      val below = fl.filter(_._2 < med).map(_._3).sum
      val upto = fl.filter(_._2 <= med).map(_._3).sum
      // defining property of the weighted median
      assert(2 * below < wtot || below * 2 == wtot, s"$flag below=$below")
      assert(2 * upto >= wtot, s"$flag upto=$upto")
    }
  }

  test("lp28: epochs are full uncorrelated permutations") {
    val full = (1 to 2).map { ep =>
      val keyed = Tables.documents(spark, sfDir).select(col("doc_id"))
        .withColumn("hkey", md5(concat(col("doc_id").cast("string"), lit(s"#ep$ep"))))
      graft.operators.GlobalRowId
        .withRowIdCols(keyed, Seq("hkey"), 8, "ord")
        .select("doc_id", "ord").as[(Long, Long)].collect().toMap
    }
    val n = full.head.size
    // each epoch is a bijection onto 0..n-1
    full.foreach(m => assert(m.values.toSeq.sorted == (0L until n).toSeq))
    // orderings are uncorrelated: mean |rank displacement| of a random
    // pair of permutations concentrates near n/3
    val disp = full(0).map { case (id, o1) => math.abs(o1 - full(1)(id)) }
    val meanDisp = disp.sum.toDouble / n
    assert(meanDisp > n / 5.0 && meanDisp < n / 2.0, s"meanDisp=$meanDisp n=$n")
  }
}
