package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bq

class SurfaceR10bqSpec extends SparkSpec {

  test("every R10bq query runs at sf0.001") {
    SurfaceR10bq.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m153: Q matches a driver-side replay; p = exp(-Q/2)") {
    val cells = spark.read.parquet(s"$sfDir/orders.parquet")
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .select(
        floor(datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")) / 7.0).cast("long").as("wk"),
        col("o_orderpriority").as("trt"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val li = cells.groupBy(_._1).map(_._2.length.toLong)
    val gj = cells.groupBy(_._2).map(_._2.length.toLong)
    val sl = li.sum; val sl2 = li.map(x => x * x).sum
    val sg = gj.sum; val sg2 = gj.map(x => x * x).sum
    val q = 2.0 * (3.0 * sg2 - sg.toDouble * sg) / (3.0 * sl - sl2)
    val row = SurfaceR10bq.m153CochranQ(spark, sfDir).collect().head
    assert(row.getLong(0) == li.size)
    assert(row.getLong(1) == sg && row.getLong(2) == sl)
    assert(math.abs(row.getDouble(3) - q) < 1e-2, s"Q ${row.getDouble(3)} vs $q")
    assert(math.abs(row.getDouble(4) - math.exp(-q / 2)) < 1e-3)
  }

  test("lp64: per-bucket counts reconcile and theory curve is monotone") {
    val rows = SurfaceR10bq.lp64LshSCurve(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 20 === 0).count()
    assert(rows.map(_.getLong(1)).sum == nDocs * (nDocs - 1) / 2,
      "every probe pair lands in exactly one bucket")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // theoretical capture probability rises with the bucket midpoint
    val theory = rows.map(_.getDouble(4))
    assert(theory.zip(theory.drop(1)).forall { case (a, b) => b >= a - 1e-9 })
    // spot-check theory at bucket 0: 1-(1-0.05^4)^2
    val t0 = rows.find(_.getLong(0) == 0L).map(_.getDouble(4))
    t0.foreach(v => assert(math.abs(v - (1 - math.pow(1 - math.pow(0.05, 4), 2))) < 1e-3))
  }
}
