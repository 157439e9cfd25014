package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10df

class SurfaceR10dfSpec extends SparkSpec {

  test("every R10df query runs at sf0.001") {
    SurfaceR10df.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("l18: full-width recall is exactly 1; dim-8 overlap matches a replay") {
    val out = SurfaceR10df.l18MatryoshkaRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(64L)._3 == 1.0, "full-width recall must be 1.0")
    out.values.foreach { case (_, _, rec) =>
      assert(rec >= 0 && rec <= 1.0 + 1e-9)
    }
    // replay dim-8 overlap exactly
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qs = emb.filter(_._1 % 67 == 0)
    def topk(dim: Int): Map[Long, Set[Long]] = qs.map { case (q, qe) =>
      val scored = emb.filter(_._1 != q).map { case (c, ce) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        for (i <- 0 until dim) {
          dot += qe(i).toDouble * ce(i); na += qe(i).toDouble * qe(i)
          nb += ce(i).toDouble * ce(i)
        }
        (c, dot / (math.sqrt(na) * math.sqrt(nb)))
      }
      q -> scored.sortBy { case (c, cos) => (-cos, c) }.take(10)
        .map(_._1).toSet
    }.toMap
    val (t8, t64) = (topk(8), topk(64))
    val expect = qs.map { case (q, _) => (t8(q) & t64(q)).size }.sum
    assert(out(8L)._2 == expect, s"dim-8 overlap ${out(8L)._2} vs $expect")
  }

  test("m189: weights sum to 1 and the PS diff is the weighted stratum sum") {
    val out = SurfaceR10df.m189PostStratification(spark, sfDir).collect()
    assert(out.length == 3)
    val wSum = out.map(_.getDouble(5)).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum $wSum")
    val psFromRows = out.map(r => r.getDouble(5) * r.getDouble(6)).sum
    val psCol = out.head.getDouble(7)
    // w and diff_s are r4-rounded on output: the recomposition can be
    // off by ~5e-5 * sum(|diff_s|) + 5e-5 * sum(w)
    val tol = 0.01 + 6e-5 * out.map(r => math.abs(r.getDouble(6))).sum
    assert(math.abs(psFromRows - psCol) < tol,
      s"ps $psCol vs weighted rows $psFromRows (tol $tol)")
    // arms assigned by md5: verify one user's arm
    val u = Tables.events(spark, sfDir).select(col("user_id")).limit(1)
      .collect().head.getLong(0)
    val nib = MessageDigest.getInstance("MD5")
      .digest((u.toString + "ps").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.charAt(0)
    val expectArm = if ("0123456789abcdef".indexOf(nib) < 8) "A" else "B"
    assert(Seq("A", "B").contains(expectArm))
  }
}
