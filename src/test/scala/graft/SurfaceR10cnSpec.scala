package graft

import graft.queries.SurfaceR10cn
import graft.operators.PrefixMax

class SurfaceR10cnSpec extends SparkSpec {

  test("every R10cn query runs at sf0.001") {
    SurfaceR10cn.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("PrefixMax: matches the single-partition window across boundaries") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // keys deliberately spread over many range partitions
    val df = (1 to 500).map(i => (i.toLong, ((i * 37) % 101).toLong))
      .toDF("k", "v")
    val got = PrefixMax.withRunningMax(df, Seq("k"), "v", numPartitions = 7)
      .select("k", "running_max", "running_max_excl")
      .collect().map(r => (r.getLong(0),
        r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1)
    var mx = Long.MinValue
    (1 to 500).zip(got).foreach { case (i, (k, incl, excl)) =>
      assert(k == i.toLong)
      val v = ((i * 37) % 101).toLong
      assert(excl == (if (i == 1) None else Some(mx)), s"excl at $i")
      mx = math.max(mx, v)
      assert(incl == mx, s"incl at $i")
    }
  }

  test("q46: skyline equals the brute-force dominance scan; duplicates survive") {
    import org.apache.spark.sql.functions._
    val pts = Tables.part(spark, sfDir).select(col("p_partkey"),
      expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("c"),
      col("p_size").cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = pts.filter { case (_, c, sz) =>
      !pts.exists { case (_, c2, s2) =>
        c2 <= c && s2 >= sz && (c2 < c || s2 > sz)
      }
    }.map(_._1).toSet
    val got = SurfaceR10cn.q46Skyline(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // frontier is a strict chain: paying more must buy MORE size, so
    // sorted by price, sizes strictly increase (except exact
    // (price,size) duplicates, which co-survive)
    val fr = pts.filter(p => got(p._1)).sortBy(p => (p._2, p._3))
    fr.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 > a._3 || (b._2 == a._2 && b._3 == a._3),
          s"chain broken at ${a._1}->${b._1}")
      case _ =>
    }
  }

  test("m174: J equals max over a driver ROC sweep and beats both trivial cuts") {
    import org.apache.spark.sql.functions._
    val data = Tables.events(spark, sfDir).select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val npos = data.count(_._2 == 1L).toLong
    val nneg = data.length - npos
    val cuts = data.map(_._1).distinct.sorted
    val best = cuts.map { t =>
      val tp = data.count(d => d._1 > t && d._2 == 1L).toLong
      val fp = data.count(d => d._1 > t && d._2 == 0L).toLong
      (t, tp.toDouble / npos - fp.toDouble / nneg)
    }.maxBy { case (t, j) => (j, -t) }
    val r = SurfaceR10cn.m174YoudenThreshold(spark, sfDir).collect().head
    assert(math.abs(r.getDouble(0) - best._1) < 1e-12, "threshold")
    assert(math.abs(r.getDouble(1) -
      math.floor(best._2 * 1e4 + 0.5) / 1e4) < 1e-12, "J")
    // J > 0: the score carries signal beyond the all-or-nothing cuts
    assert(r.getDouble(1) > 0.0)
    assert(r.getLong(4) == npos && r.getLong(5) == nneg)
  }
}
