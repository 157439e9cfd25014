package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10k

class SurfaceR10kSpec extends SparkSpec {

  test("every R10k query runs at sf0.001") {
    SurfaceR10k.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("q38: semi/anti decomposition equals a driver-side exists replay") {
    val out = SurfaceR10k.q38ExistsNotExists(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val l = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS")).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = l.groupBy(_._1)
    val counts = l.filter(_._3).flatMap { case (ok, sk, _) =>
      val others = byOrder(ok).filter(_._2 != sk)
      if (others.nonEmpty && !others.exists(_._3)) Some(sk) else None
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val names = Tables.supplier(spark, sfDir).select("s_suppkey", "s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expTop = counts.toSeq.map { case (sk, n) => (names(sk), n) }
      .sortBy { case (nm, n) => (-n, nm) }.take(25).toMap
    assert(out == expTop)
  }

  test("q40: every returned supplier carries the max revenue") {
    val rows = SurfaceR10k.q40ViewMax(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, "returned suppliers disagree on revenue")
  }

  test("q37: all rows exceed the quantity threshold and are sorted") {
    val rows = SurfaceR10k.q37HavingTop(spark, sfDir).collect()
    assert(rows.forall(_.getDouble(5) > 180))
    val prices = rows.map(_.getDouble(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q39: no returned customer has any order") {
    // recompute: selected cold customers joined back to orders = empty
    val nations = Seq(1, 3, 5, 7, 9, 11, 13)
    val avgBal = Tables.customer(spark, sfDir)
      .where(col("c_acctbal") > 0 && col("c_nationkey").isin(nations: _*))
      .agg(avg("c_acctbal")).collect().head.getDouble(0)
    val cold = Tables.customer(spark, sfDir)
      .where(col("c_nationkey").isin(nations: _*) && col("c_acctbal") > avgBal)
      .join(Tables.orders(spark, sfDir)
          .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
    val byNation = cold.groupBy("c_nationkey").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val out = SurfaceR10k.q39ColdCustomers(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == byNation)
  }
}
