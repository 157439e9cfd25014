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

  test("forward as-of picks earliest right row >= left time, per key") {
    import spark.implicits._
    val left = Seq(
      ("L1", "u1", 100L), // matches R at 101 (next after)
      ("L2", "u1", 50L),  // matches R at 50 (equality)
      ("L3", "u1", 102L), // after every right row -> null
      ("L4", "u2", 90L),  // different key, matches u2's R at 100
    ).toDF("lid", "user", "t")
    val right = Seq(
      ("u1", 50L, "r50"),
      ("u1", 90L, "r90"),
      ("u1", 101L, "r101"),
      ("u2", 100L, "r100"),
      ("u3", 1L, "other-key"),
    ).toDF("user", "t", "tag")

    val out = AsOfJoin.forward(left, right, Seq("user"), "t", "t")
      .select("lid", "asof_tag", "asof_t")
      .collect().map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.get(2))))).toMap

    assert(out("L1") == (Some("r101"), Some(101L)))
    assert(out("L2") == (Some("r50"), Some(50L)))
    assert(out("L3") == (None, None))
    assert(out("L4") == (Some("r100"), Some(100L)))
  }

  test("forward as-of is the time-reversed backward join (random data)") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val lrows = (0 until 80).map(i =>
      (i.toLong, (rnd.nextInt(5)).toLong, rnd.nextInt(40).toLong))
    // distinct (k, t) right rows so ties cannot be broken differently
    val rrows = (0 until 80).map(_ =>
      ((rnd.nextInt(6)).toLong, rnd.nextInt(40).toLong))
      .distinct.map { case (k, t) => (k, t, rnd.nextDouble()) }
    val l = lrows.toDF("id", "k", "t")
    val r = rrows.toDF("k", "t", "v")
    // forward(t) == backward(-t) with times negated back
    val fwd = AsOfJoin.forward(l, r, Seq("k"), "t", "t")
      .select("id", "asof_t", "asof_v").collect()
      .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
    val lNeg = l.withColumn("t", -$"t")
    val rNeg = r.withColumn("t", -$"t")
    val bwdNeg = AsOfJoin.backward(lNeg, rNeg, Seq("k"), "t", "t")
      .select($"id", (-$"asof_t").as("asof_t"), $"asof_v").collect()
      .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(fwd == bwdNeg)
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
