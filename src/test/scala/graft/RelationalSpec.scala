package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every registered query runs at sf0.001 and yields a schema") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name produced empty schema")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every oracle key has a matching query key") {
    val missing = Relational.oracleSql.keySet -- Relational.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("q1 groups are the 6 returnflag x linestatus combos") {
    val rows = Relational.q1ScanAgg(spark, sfDir).collect()
    assert(rows.length == 6)
    val flags = rows.map(_.getString(0)).distinct.sorted
    assert(flags.sameElements(Array("A", "N", "R")))
  }

  test("q3 top-k never exceeds 3 per customer") {
    val df = Relational.q3WindowTopk(spark, sfDir)
    val maxPer = df.groupBy("o_custkey").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxPer <= 3)
  }

  test("q4 anti join + customers-with-orders = all customers") {
    val without = Relational.q4AntiJoin(spark, sfDir).head().getLong(0)
    val withOrders = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    val total = Tables.customer(spark, sfDir).count()
    assert(without + withOrders == total)
  }

  test("u2/u3 set algebra: intersect ⊆ each side; except ∩ subtrahend = ∅") {
    val inter = Relational.u2Intersect(spark, sfDir)
    val rich = Tables.customer(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("c_acctbal") > 5000).select("c_custkey")
    assert(inter.exceptAll(rich).count() == 0)
    val exc = Relational.u3Except(spark, sfDir)
    val fCusts = Tables.orders(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      .select(org.apache.spark.sql.functions.col("o_custkey").as("c_custkey"))
    assert(exc.intersect(fCusts).count() == 0)
  }
}
