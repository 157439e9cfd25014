package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.queries.SurfaceR6m

class SurfaceR6mSpec extends SparkSpec {

  test("S18: PERMISSIVE mode quarantines exactly the three corrupt lines") {
    val landing = SurfaceR6m.s18WriteLanding(spark, sfDir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType),
      StructField("_corrupt_record", StringType)))
    val all = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(landing)
      .cache()
    assert(all.count() == 28) // 25 good + 3 corrupt
    val bad = all.where(col("_corrupt_record").isNotNull).select("_corrupt_record")
      .collect().map(_.getString(0)).toSet
    assert(bad == SurfaceR6m.s18BadLines.toSet)
    all.unpersist()
  }

  test("J13: bucketed time-range join equals brute force, with no cartesian in the plan") {
    val bucketed = SurfaceR6m.j13TimeRangeJoin(spark, sfDir)
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("us").as("p_us"))
    val x = e.where(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("us").as("e_us"))
    val brute = p.crossJoin(x)
      .where(abs(col("p_us") - col("e_us")) < 300L * 1000000L)
      .select(col("p_id"), col("e_id"), (col("e_us") - col("p_us")).as("lag_us"))
    assert(bucketed.count() > 0)
    assert(bucketed.exceptAll(brute).count() == 0 && brute.exceptAll(bucketed).count() == 0)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "range join must go through the bucket equi-join")
  }
}
