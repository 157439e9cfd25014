package graft

import org.apache.spark.sql.functions._

/** Laws for [[org.apache.spark.sql.graft.GraftChainRelation]] — the
  * `graft_chain` SQL relation (VERDICT r15 item 7). The q76 oracle
  * hash is the end-to-end authority (VERSION AS OF ≡ readAsOf, suffix
  * form, pruning through the surface, TIMESTAMP AS OF refusal); these
  * pin the edges: travel below schema changes keeps the old shape in
  * SQL too, bad versions fail loudly with the committed set named,
  * and unrelated identifiers are left for Spark's own resolution.
  */
class SqlTimeTravelSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_sqltt_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  test("SQL travel crosses schema events: old shape below, new shape at head") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((1L, 11L)).toDF("k", "n")) // v2
    DeltaChain.renameColumn(spark, root, "n", "m")                     // v3
    val v2 = spark.sql(s"SELECT * FROM graft_chain.`$root` VERSION AS OF 2")
    assert(v2.columns.toSeq === Seq("k", "n"))
    assert(v2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 11L, 2L -> 20L))
    val head = spark.sql(s"SELECT * FROM graft_chain.`$root`")
    assert(head.columns.toSeq === Seq("k", "m"))
    // SQL expressions bind against the travel-point schema
    val agg = spark.sql(
      s"SELECT sum(m) AS s FROM graft_chain.`$root` VERSION AS OF 3")
      .collect()(0).getLong(0)
    assert(agg === 31L)
  }

  test("a version outside the committed set fails naming the set; bad literals loudly") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 100)
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_chain.`$root` VERSION AS OF 9").collect()
    }
    assert(e1.getMessage.contains("not in committed"))
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_chain.`$root` VERSION AS OF 'x1'").collect()
    }
    assert(e2.getMessage.contains("integer version"))
  }

  test("identifiers that are not graft_chain pass through untouched") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("a", "b").createOrReplaceTempView("sqltt_plain")
    assert(spark.sql("SELECT b FROM sqltt_plain").collect()(0).getLong(0) === 2L)
    // a two-part name with a different head still resolves (or fails)
    // through Spark's own catalog path, never ours
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM not_graft.`/nope`").collect()
    }
    assert(!e.getMessage.contains("graft_chain"))
  }

  test("joins mixing two travel points of one chain work in a single query") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root,
      Seq((1L, 15L, false), (2L, 0L, true)).toDF("k", "n", "del"), Some("del"))
    val drift = spark.sql(
      s"""SELECT cur.k, cur.n - old.n AS dn
         |FROM graft_chain.`$root` cur
         |JOIN graft_chain.`$root` VERSION AS OF 1 old ON cur.k = old.k
         |""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drift === Map(1L -> 5L))
  }
}
