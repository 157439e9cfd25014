package graft

import org.apache.spark.sql.functions._

/** Laws for round-13 batch 1: the versioned snapshot table and the
  * AQE skew-join split. The oracle hash-check is the authority; these
  * pin the invariants a hash can't name when it fails — snapshot
  * immutability, commit atomicity (manifest-before-visibility), and
  * that q51's skew assertion actually fires on a skewed input.
  */
class SurfaceR13aSpec extends SparkSpec {
  import operators.VersionedTable

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_vt_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  test("versioned table: create → merge → merge, versions enumerate and read back") {
    import spark.implicits._
    val root = freshRoot()
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "v", "x")
    assert(VersionedTable.create(root, v1) === 1)
    // v2: update k=2, delete k=3, insert k=4
    val s2 = Seq((2L, "b2", 21L, false), (3L, "c", 30L, true),
      (4L, "d", 40L, false)).toDF("k", "v", "x", "del")
    assert(VersionedTable.writeVersion(spark, root, s2, Seq("k"), Some("del")) === 2)
    // v3: re-insert k=3 (was deleted — NOT MATCHED now, so it inserts)
    val s3 = Seq((3L, "c3", 31L, false)).toDF("k", "v", "x", "del")
    assert(VersionedTable.writeVersion(spark, root, s3, Seq("k"), Some("del")) === 3)
    assert(VersionedTable.versions(root) === Seq(1, 2, 3))
    assert(VersionedTable.latestVersion(root) === 3)
    def snap(v: Int) = VersionedTable.readAsOf(spark, root, v)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(snap(1) === Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    assert(snap(2) === Seq((1L, "a", 10L), (2L, "b2", 21L), (4L, "d", 40L)))
    assert(snap(3) === Seq((1L, "a", 10L), (2L, "b2", 21L), (3L, "c3", 31L), (4L, "d", 40L)))
    // read() = latest
    assert(VersionedTable.read(spark, root).count() === 4)
  }

  test("versioned table: earlier snapshots are immutable across later commits") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      Seq((1L, 100L), (2L, 200L)).toDF("k", "x"))
    val before = VersionedTable.readAsOf(spark, root, 1)
      .orderBy("k").collect().toSeq
    VersionedTable.writeVersion(spark, root,
      Seq((1L, 111L)).toDF("k", "x"), Seq("k"))
    VersionedTable.writeVersion(spark, root,
      Seq((9L, 900L)).toDF("k", "x"), Seq("k"))
    val after = VersionedTable.readAsOf(spark, root, 1)
      .orderBy("k").collect().toSeq
    assert(before === after)
  }

  test("versioned table: uncommitted versions are invisible; bad reads fail by name") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, Seq((1L, 1L)).toDF("k", "x"))
    // an orphan snapshot dir with NO manifest entry (a crash mid-commit
    // leaves exactly this) must not be readable or enumerated
    Seq((2L, 2L)).toDF("k", "x").write.parquet(s"$root/v2")
    assert(VersionedTable.versions(root) === Seq(1))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.readAsOf(spark, root, 2)
    }
    assert(e.getMessage.contains("version 2 not in committed"))
    // create() on an existing table refuses rather than clobbering
    intercept[IllegalArgumentException] {
      VersionedTable.create(root, Seq((1L, 1L)).toDF("k", "x"))
    }
    // writeVersion on a nonexistent table refuses
    intercept[IllegalArgumentException] {
      VersionedTable.writeVersion(spark, freshRoot(),
        Seq((1L, 1L)).toDF("k", "x"), Seq("k"))
    }
  }

  test("versioned table: validateUniqueKeys propagates through writeVersion") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, Seq((1L, 1L)).toDF("k", "x"))
    val dup = Seq((1L, 10L), (1L, 11L)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      VersionedTable.writeVersion(spark, root, dup, Seq("k"),
        validateUniqueKeys = true)
    }
    // the failed commit must not have published a version
    assert(VersionedTable.versions(root) === Seq(1))
  }

  test("q50: registry query yields three hash-distinct versions with expected counts") {
    val out = queries.SurfaceR13a.q50VersionedTable(spark, sfDir).cache()
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).where(col("o_orderkey") % 3 === 0)
    val n1 = base.count()
    assert(out.where(col("version") === 1).count() === n1)
    // v2 = v1 − deleted(mod 30) + inserted(mod 3 = 1 ∧ mod 11 = 0)
    val all = Tables.orders(spark, sfDir).select(col("o_orderkey"))
    val nDel2 = all.where(col("o_orderkey") % 30 === 0).count()
    val nIns2 = all.where(col("o_orderkey") % 3 === 1 &&
      col("o_orderkey") % 11 === 0).count()
    assert(out.where(col("version") === 2).count() === n1 - nDel2 + nIns2)
    assert(out.select("version").distinct().count() === 3)
    out.unpersist()
  }

  test("q51: the skew split engages and the result matches the unsplit plan") {
    // run the registry query (it REQUIREs the skewed marker internally)
    val out = queries.SurfaceR13a.q51SkewAqe(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    // recompute WITHOUT the skew-tuned configs: same rows must come out
    // (the split only changes execution, never the answer)
    val facts = Tables.lineitem(spark, sfDir).select(
      when(col("l_orderkey") % 10 < 5, lit(0L))
        .otherwise(col("l_orderkey") % 1000).as("k"),
      expr("CAST(floor(l_extendedprice * 100 + 5e-1) AS BIGINT)").as("qp"))
    val dims = Tables.orders(spark, sfDir)
      .groupBy((col("o_orderkey") % 1000).as("k"))
      .agg(count(lit(1)).as("dim_n"))
    val plain = facts.join(dims, "k")
      .groupBy((col("k") % 7).as("g"))
      .agg(count(lit(1)).as("n_li"), sum(col("qp")).as("qsum"),
        sum(col("dim_n")).as("dimsum"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(out === plain)
  }
}
