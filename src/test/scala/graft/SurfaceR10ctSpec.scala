package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10ct

class SurfaceR10ctSpec extends SparkSpec {

  private def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("every R10ct query runs at sf0.001") {
    SurfaceR10ct.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m177: DiD matches a cell replay; placebo stays an order smaller") {
    val data = Tables.orders(spark, sfDir)
      .where(year(col("o_orderdate")).isin(1996, 1997))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("o_custkey"), (year(col("o_orderdate")) === 1997).as("post"),
        (col("c_mktsegment") === "BUILDING").as("treat"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getLong(3)))
    def mean(f: ((Long, Boolean, Boolean, Long)) => Boolean): Double = {
      val g = data.filter(f); g.map(_._4).sum.toDouble / g.length
    }
    val did = (mean(r => r._3 && r._2) - mean(r => r._3 && !r._2)) -
      (mean(r => !r._3 && r._2) - mean(r => !r._3 && !r._2))
    def pseudo(ck: Long): Boolean =
      "0123456789abcdef".indexOf(md5hex(ck.toString).head) < 8
    val pla = (mean(r => !r._3 && r._2 && pseudo(r._1)) -
      mean(r => !r._3 && !r._2 && pseudo(r._1))) -
      (mean(r => !r._3 && r._2 && !pseudo(r._1)) -
        mean(r => !r._3 && !r._2 && !pseudo(r._1)))
    val row = SurfaceR10ct.m177Did(spark, sfDir).collect().head
    assert(math.abs(row.getDouble(4) - r4d(did)) < 1e-9, "did")
    assert(math.abs(row.getDouble(7) - r4d(pla)) < 1e-9, "placebo")
    assert(row.getDouble(5) > 0, "se")
    // both groups populated in both periods
    assert(Seq(0, 1, 2, 3).forall(i => row.getLong(i) > 0))
  }

  test("m178: seasonal S sums the per-weekday statistics; cycles don't leak") {
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)")
        .as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val strata = daily.groupBy(_._1 % 7)
    val sTot = strata.values.map { pts =>
      val sorted = pts.sortBy(_._1)
      (for { i <- sorted.indices; j <- i + 1 until sorted.length }
        yield math.signum(sorted(j)._2.toDouble - sorted(i)._2).toLong).sum
    }.sum
    val varTot = strata.values.map { pts =>
      val nk = pts.length.toLong
      val ties = pts.groupBy(_._2).values
        .map(g => g.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      nk * (nk - 1) * (2 * nk + 5) - ties
    }.sum / 18.0
    val z =
      if (sTot > 0) (sTot - 1.0) / math.sqrt(varTot)
      else if (sTot < 0) (sTot + 1.0) / math.sqrt(varTot)
      else 0.0
    val row = SurfaceR10ct.m178SeasonalMk(spark, sfDir).collect().head
    assert(row.getLong(0) == daily.length.toLong)
    assert(row.getLong(1) == sTot, s"S ${row.getLong(1)} vs $sTot")
    assert(math.abs(row.getDouble(2) - r4d(z)) < 1e-9)
    // a pure weekly cycle contributes nothing within strata: replaying
    // on y' = dow (cycle only) gives S = 0 exactly
    val cyc = daily.map { case (d, _) => (d, d % 7) }.groupBy(_._1 % 7)
    val sCyc = cyc.values.map { pts =>
      val sorted = pts.sortBy(_._1)
      (for { i <- sorted.indices; j <- i + 1 until sorted.length }
        yield math.signum(sorted(j)._2.toDouble - sorted(i)._2).toLong).sum
    }.sum
    assert(sCyc == 0L)
  }
}
