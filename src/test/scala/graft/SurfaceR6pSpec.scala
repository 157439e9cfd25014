package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR6p

class SurfaceR6pSpec extends SparkSpec {

  test("LP18: admitted batch rows share no content hash with the corpus, and none are lost") {
    val admitted = SurfaceR6p.lp18IncrementalDedup(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .withColumn("h", md5(col("text").cast("binary")))
    val corpusHashes = docs.where(col("doc_id") % 3 =!= 0).select("h").distinct()
    val leaked = admitted
      .join(docs.select("doc_id", "h"), "doc_id")
      .join(corpusHashes, "h")
    assert(leaked.count() == 0, "admitted row collides with corpus hash")
    // every batch row is either admitted or explained: collides with the
    // corpus, or loses a within-batch tie
    val batch = docs.where(col("doc_id") % 3 === 0)
    val admittedIds = admitted.select("doc_id")
    val dropped = batch.join(admittedIds, Seq("doc_id"), "left_anti")
    val explained = dropped
      .join(corpusHashes, Seq("h"), "left_semi")
      .union(dropped.join(
        batch.groupBy("h").agg(min("doc_id").as("m")),
        Seq("h")).where(col("doc_id") =!= col("m")).select(dropped.columns.map(col): _*))
    assert(dropped.exceptAll(explained.distinct()).count() == 0)
  }

  test("X12: the SQL UDF inlines — no ScalaUDF in the plan, codegen intact") {
    val df = SurfaceR6p.x12SqlUdf(spark, sfDir)
    assert(df.collect().length == 3) // execute THIS plan so AQE finalizes it
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "SQL UDF must inline, not wrap")
    assert(plan.contains("(1.0 - "), "expected the inlined expression in the aggregate")
    assert(plan.contains("*("), "expected whole-stage-codegen stages (the '*(n)' markers)")
  }
}
