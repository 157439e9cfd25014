package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR11c

class SurfaceR11cSpec extends SparkSpec {

  test("every R11c query runs at sf0.001") {
    SurfaceR11c.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt69: the SQL fold matches an independent Scala replay") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
      .orderBy("event_type", "day")
      .select(col("event_type"), col("v"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    def replay(xs: Vector[Double]): (Double, Double, Vector[Double]) = {
      val m = xs.take(7).sum / 7.0 // warmup mean (order matches: left fold)
      var l = m; var b = 0.0
      var s = xs.take(7).map(_ - m)
      xs.drop(7).foreach { x =>
        val sLag = s.head
        val lNew = 0.5 * (x - sLag) + 0.5 * (l + b)
        val bNew = 0.3 * (lNew - l) + 0.7 * b
        val sNew = 0.3 * (x - lNew) + 0.7 * sLag
        s = s.tail :+ sNew; l = lNew; b = bNew
      }
      (l, b, s)
    }
    val got = SurfaceR11c.queries("lt69_holt_winters")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.nonEmpty)
    got.foreach { case (et, row) =>
      val xs = daily(et)
      assert(xs.length >= 14, s"$et below the two-season floor")
      val (l, b, s) = replay(xs)
      def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(math.abs(row.getAs[Double]("level") - r4(l)) < 1e-9, s"$et level")
      assert(math.abs(row.getAs[Double]("trend") - r4(b)) < 1e-9, s"$et trend")
      assert(math.abs(row.getAs[Double]("f1") - r4(l + 1 * b + s(0))) < 1e-9, s"$et f1")
      assert(math.abs(row.getAs[Double]("f3") - r4(l + 3 * b + s(2))) < 1e-9, s"$et f3")
    }
  }

  test("lt70: reported pairs genuinely share >= 8 surviving fingerprints") {
    import spark.implicits._
    // independent recomputation of each doc's surviving fingerprint set
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // docs under w+k-1 = 19 chars have no FULL 8-gram window: the query
    // selects nothing for them, so they must not contribute here either
    // (Scala's sliding emits one PARTIAL window when length < 8)
    val finger: Map[Long, Set[String]] = docs
      .filter(_._2.length >= 19).map { case (id, text) =>
        val grams = (0 to text.length - 12)
          .map(i => java.security.MessageDigest.getInstance("MD5")
            .digest(text.substring(i, i + 12).getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
        val sel = grams.sliding(8).map(_.min).toSet
        id -> sel
      }.toMap
    val df = finger.toSeq.flatMap { case (id, hs) => hs.map(id -> _) }
      .groupBy(_._2).filter(_._2.size <= 5).values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = SurfaceR11c.queries("lt70_winnowing")(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty, "no winnowing pairs at sf0.001 — fixture drift?")
    rows.foreach { case (a, b, shared) =>
      val inter = df.getOrElse(a, Set.empty) & df.getOrElse(b, Set.empty)
      assert(inter.size.toLong == shared, s"pair ($a,$b): $shared vs ${inter.size}")
      assert(shared >= 8)
    }
  }

  test("lt70: winnowing keeps roughly 2/(w+1) of the grams") {
    import spark.implicits._
    val (selected, grams) = {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val perDoc = docs.filter(_._2.length >= 19).map { case (_, text) =>
        val gs = (0 to text.length - 12)
          .map(i => java.security.MessageDigest.getInstance("MD5")
            .digest(text.substring(i, i + 12).getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
        (gs.sliding(8).map(_.min).toSet.size, gs.length)
      }
      (perDoc.map(_._1.toLong).sum.toDouble, perDoc.map(_._2.toLong).sum.toDouble)
    }
    val density = selected / grams
    // theoretical expectation for random hashes is 2/(w+1) = 0.222;
    // template-repeated text dedups some selections, so allow a band
    assert(density > 0.05 && density < 0.45, s"winnowing density $density")
  }
}
