package graft

import graft.queries.SurfaceR10aj

class SurfaceR10ajSpec extends SparkSpec {

  test("lp51: contract passes on the fixture and fails on a drifted feed") {
    val rows = SurfaceR10aj.lp51SchemaContract(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getBoolean(4), s"${r.getString(1)} drifted"))
    // negative control: a feed missing a column must NOT pass
    import spark.implicits._
    Seq((1L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet("target/tmp/lp51_drifted/documents.parquet")
    val drifted = SurfaceR10aj.lp51SchemaContract(
      spark, "target/tmp/lp51_drifted").collect()
    assert(drifted.exists(!_.getBoolean(4)),
      "drifted feed passed the contract")
    assert(drifted.filter(!_.getBoolean(4))
      .exists(_.getString(3) == "MISSING"))
  }
}
