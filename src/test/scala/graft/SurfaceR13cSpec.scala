package graft

import org.apache.spark.sql.functions._

/** Laws for round-13 batch 3. The oracle hash-check is the authority
  * for the registry keys (which also REQUIRE their plan properties
  * inline — no-Exchange for s33, the CBO broadcast flip for s34);
  * these pin the operator-level algebra the keys can't reach:
  * group-MOVING updates and full-group deletion in the incremental-MV
  * fold, and schema-evolution edges.
  */
class SurfaceR13cSpec extends SparkSpec {
  import operators.{IncrementalAgg, VersionedTable}

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_r13c_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  test("incremental MV: group-moving update transfers the contribution") {
    import spark.implicits._
    val root = freshRoot()
    // (k, g, v): key, group, value
    VersionedTable.create(root,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("k", "g", "v"))
    val mv0 = VersionedTable.read(spark, root)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("qsum"))
    // k=2 MOVES from group a to group b (and changes value); k=3 deleted;
    // k=4 inserted into a brand-new group c
    VersionedTable.writeVersion(spark, root,
      Seq((2L, "b", 25L, false), (3L, "b", 30L, true), (4L, "c", 40L, false))
        .toDF("k", "g", "v", "del"),
      Seq("k"), Some("del"))
    val feed = VersionedTable.changes(spark, root, 1, 2, Seq("k"))
    val mv1 = IncrementalAgg.applyCountSumDelta(mv0, feed, "g", "v")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // full recompute truth: a={k1}, b={k2'}, c={k4}
    assert(mv1 === Seq(("a", 1L, 10L), ("b", 1L, 25L), ("c", 1L, 40L)))
  }

  test("incremental MV: a group emptied by deletes drops out of the view") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      Seq((1L, "solo", 5L), (2L, "keep", 7L)).toDF("k", "g", "v"))
    val mv0 = VersionedTable.read(spark, root)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("qsum"))
    VersionedTable.writeVersion(spark, root,
      Seq((1L, "solo", 5L, true)).toDF("k", "g", "v", "del"),
      Seq("k"), Some("del"))
    val feed = VersionedTable.changes(spark, root, 1, 2, Seq("k"))
    val mv1 = IncrementalAgg.applyCountSumDelta(mv0, feed, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv1 === Seq(("keep", 1L, 7L)))
  }

  test("incremental MV: empty feed is the identity") {
    import spark.implicits._
    val mv0 = Seq(("a", 2L, 30L)).toDF("g", "n", "qsum")
    val feed = Seq.empty[(String, Long, String)].toDF("g", "v", "_change_type")
    val mv1 = IncrementalAgg.applyCountSumDelta(mv0, feed, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv1 === Seq(("a", 2L, 30L)))
  }

  test("commitNext: column order normalizes; schema mismatch fails by name") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, Seq((1L, "a")).toDF("k", "v"))
    // reordered columns are fine — commitNext normalizes to table order
    VersionedTable.commitNext(spark, root,
      Seq(("b", 2L)).toDF("v", "k"))
    assert(VersionedTable.read(spark, root).columns.toSeq === Seq("k", "v"))
    assert(VersionedTable.read(spark, root).collect()(0).getLong(0) === 2L)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commitNext(spark, root, Seq((3L, "c", 1)).toDF("k", "v", "extra"))
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("addColumn: rejects an existing name; v1 keeps the narrow schema") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, Seq((1L, 10L)).toDF("k", "v"))
    VersionedTable.addColumn(spark, root, "w", col("v") * 2)
    assert(VersionedTable.readAsOf(spark, root, 1).columns.toSeq === Seq("k", "v"))
    assert(VersionedTable.read(spark, root).columns.toSeq === Seq("k", "v", "w"))
    assert(VersionedTable.read(spark, root).select("w").collect()(0).getLong(0) === 20L)
    intercept[IllegalArgumentException] {
      VersionedTable.addColumn(spark, root, "v", lit(0L))
    }
  }
}
