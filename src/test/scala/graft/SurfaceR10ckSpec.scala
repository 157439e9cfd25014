package graft

import graft.queries.SurfaceR10ck

class SurfaceR10ckSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("every R10ck query runs at sf0.001") {
    SurfaceR10ck.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp68: HRW replay matches; rescale moves docs ONLY to the new shard") {
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0))
    def argmax(id: Long, n: Int): String =
      (0 until n).map(i => s"shard$i")
        .maxBy(sh => (md5hex(s"$id:$sh"), sh))
    val s0 = ids.map(id => id -> argmax(id, 8)).toMap
    val s1 = ids.map(id => id -> argmax(id, 9)).toMap
    val moved = ids.count(id => s0(id) != s1(id))
    // every moved doc moved to the new shard
    assert(ids.filter(id => s0(id) != s1(id)).forall(id => s1(id) == "shard8"))
    val rows = SurfaceR10ck.lp68RendezvousSharding(spark, sfDir).collect()
    val byShard = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (0 until 9).map(i => s"shard$i").foreach { sh =>
      val (nb, na, arr) = byShard(sh)
      assert(nb == ids.count(id => s0(id) == sh), s"$sh before")
      assert(na == ids.count(id => s1(id) == sh), s"$sh after")
      assert(arr == (if (sh == "shard8") moved else 0L), s"$sh arrived")
    }
    // minimal-movement: ~1/9 of docs move (loose 3x bound, deterministic)
    assert(moved > 0 && moved < ids.length / 3, s"moved=$moved")
  }

  test("t22: totals after checkpoint restart equal the batch aggregation") {
    import org.apache.spark.sql.functions._
    val expected = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1e4 + 0.5).cast("long")).as("sv4"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        math.floor(r.getLong(2) / 10000.0 * 1e4 + 0.5) / 1e4)).toMap
    val rows = SurfaceR10ck.t22CheckpointRestart(spark, sfDir).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, sv) = expected(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} count")
      assert(math.abs(r.getDouble(2) - sv) < 1e-9, s"${r.getString(0)} sum")
    }
  }
}
