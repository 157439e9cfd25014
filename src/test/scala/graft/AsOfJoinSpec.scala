package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of picks latest right row <= left time, per key") {
    import spark.implicits._
    val left = Seq(
      ("L1", "u1", 100L), // matches R at 90
      ("L2", "u1", 50L),  // matches R at 50 (equality)
      ("L3", "u1", 10L),  // no match -> null
      ("L4", "u2", 100L), // different key, matches u2's R at 100
    ).toDF("lid", "user", "t")
    val right = Seq(
      ("u1", 50L, "r50"),
      ("u1", 90L, "r90"),
      ("u1", 101L, "r101"), // after every left row
      ("u2", 100L, "r100"),
      ("u3", 1L, "other-key"),
    ).toDF("user", "t", "tag")

    val out = AsOfJoin.backward(left, right, Seq("user"), "t", "t")
      .select("lid", "asof_tag", "asof_t")
      .collect().map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.get(2))))).toMap

    assert(out("L1") == (Some("r90"), Some(90L)))
    assert(out("L2") == (Some("r50"), Some(50L)))
    assert(out("L3") == (None, None))
    assert(out("L4") == (Some("r100"), Some(100L)))
  }

  test("as-of payload columns all come from the same matched row") {
    import spark.implicits._
    val left = Seq(("L", "k", 10L)).toDF("lid", "key", "t")
    val right = Seq(("k", 5L, "a", 1.0), ("k", 7L, "b", 2.0)).toDF("key", "t", "s", "v")
    val r = AsOfJoin.backward(left, right, Seq("key"), "t", "t").head()
    assert(r.getAs[String]("asof_s") == "b")
    assert(r.getAs[Double]("asof_v") == 2.0)
    assert(r.getAs[Long]("asof_t") == 7L)
  }
}
