package graft

class GraftSessionSpec extends SparkSpec {

  test("builder pins the engine posture: extensions, UTC, nanos shim, partitions") {
    // inspect the builder's effect through a derived session in the same
    // JVM: getOrCreate() on the shared context applies session-level confs
    val s = GraftSession.builder("local[4]").getOrCreate()
    try {
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
      assert(s.conf.get("spark.sql.shuffle.partitions") == "4")
      // the extension functions must resolve — that is what makes the
      // session "the library's" rather than vanilla Spark
      assert(s.sql("SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
        .head().getDouble(0) == 1.0)
      assert(s.sql(
        """SELECT bloom_might_contain(
          |  (SELECT bloom_agg(xxhash64(x), 10L) FROM VALUES (1L) t(x)),
          |  xxhash64(1L)) AS hit""".stripMargin).head().getBoolean(0))
    } finally () // shared-context session: do not stop
  }

  test("shuffle-partition sizing: local masters get cores, clusters keep the AQE default") {
    assert(GraftSession.defaultShufflePartitions("local[4]") == 4)
    assert(GraftSession.defaultShufflePartitions("local[32]") == 32)
    assert(GraftSession.defaultShufflePartitions("local") == 1)
    assert(GraftSession.defaultShufflePartitions("local[*]") ==
      Runtime.getRuntime.availableProcessors())
    // a driver-side core count must never be baked into a cluster config
    assert(GraftSession.defaultShufflePartitions("spark://example:7077") == 200)
    assert(GraftSession.defaultShufflePartitions("yarn") == 200)
  }
}
