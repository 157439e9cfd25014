package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10o

class SurfaceR10oSpec extends SparkSpec {

  test("every R10o query runs at sf0.001") {
    SurfaceR10o.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m83: average precision matches a driver-side ranking recompute") {
    val row = SurfaceR10o.m83PrAuc(spark, sfDir).collect().head
    val ranked = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"),
        (col("event_type") === "purchase").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy { case (id, v, _) => (-v, id) }
    var tp = 0L; var apSum = 0.0
    ranked.zipWithIndex.foreach { case ((_, _, y), i) =>
      if (y) { tp += 1; apSum += tp.toDouble / (i + 1) }
    }
    val expect = apSum / tp
    assert(row.getLong(0) == tp)
    assert(math.abs(row.getDouble(1) - expect) < 1e-3,
      s"pr_auc ${row.getDouble(1)} vs $expect")
  }

  test("lt25: chain rule H(X,Y) = H(X) + H(Y|X) holds") {
    val row = SurfaceR10o.lt25CondEntropy(spark, sfDir).collect().head
    val (hx, hcond, hjoint) =
      (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(hx > 0 && hcond > 0 && hjoint > 0)
    assert(math.abs(hjoint - (hx + hcond)) < 1e-3,
      s"chain rule broken: $hjoint vs ${hx + hcond}")
    // conditioning never increases entropy: H(Y|X) <= H(Y) <= ln(vocab)
    assert(hcond <= hjoint)
  }

  test("m86: paired t matches a driver-side recompute on the differences") {
    val row = SurfaceR10o.m86PairedTtest(spark, sfDir).collect().head
    val per = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(
        avg(when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"),
          col("o_totalprice"))).as("a1"),
        avg(when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"),
          col("o_totalprice"))).as("a2"))
      .where(col("a1").isNotNull && col("a2").isNotNull)
      .select((col("a1") - col("a2")).as("d")).collect().map(_.getDouble(0))
    val n = per.length.toDouble
    val mean = per.sum / n
    val sd = math.sqrt(per.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    val t = mean / (sd / math.sqrt(n))
    assert(row.getLong(0) == per.length)
    assert(math.abs(row.getDouble(1) - mean) < 1e-2)
    assert(math.abs(row.getDouble(2) - t) < 1e-2,
      s"t ${row.getDouble(2)} vs $t")
  }

  test("a35: alpha positive; xk is the 200th largest total (or corpus min)") {
    val row = SurfaceR10o.a35HillTail(spark, sfDir).collect().head
    assert(row.getLong(0) == math.min(200L,
      Tables.orders(spark, sfDir).count()))
    assert(row.getDouble(2) > 0, s"alpha not positive: ${row.getDouble(2)}")
    val kth = Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(row.getLong(0).toInt)
      .agg(min("o_totalprice")).collect().head.getDouble(0)
    assert(math.abs(row.getDouble(1) - kth) < 1e-3)
  }
}
