package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR6l

class SurfaceR6lSpec extends SparkSpec {

  test("T16: AvailableNow drain terminates and equals the batch aggregate") {
    val drained = SurfaceR6l.t16AvailableNow(spark, sfDir) // awaitTermination inside
    val batch = Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    assert(drained.count() > 0)
    assert(drained.exceptAll(batch).count() == 0 && batch.exceptAll(drained).count() == 0)
  }

  test("F26: map ladder equals the relational union ladder") {
    val viaMap = SurfaceR6l.f26MapHof(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val relational = docs.select(col("doc_id"), lit("chars").as("key"),
        (col("n_chars") * 2).as("value"))
      .union(docs.select(col("doc_id"), lit("words").as("key"),
        (size(split(col("text"), " ")).cast("long") * 2).as("value")))
      .where(col("value") > 500)
    assert(viaMap.count() > 0)
    assert(viaMap.exceptAll(relational).count() == 0 &&
      relational.exceptAll(viaMap).count() == 0)
  }
}
