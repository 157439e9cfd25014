package graft

import graft.queries.SurfaceR10cg

class SurfaceR10cgSpec extends SparkSpec {

  private def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("every R10cg query runs at sf0.001") {
    SurfaceR10cg.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt52: micro ROUGE matches a driver-side clipped-overlap replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = docs.map(d => d._1 -> d).toMap
    val pairs = docs.flatMap { case (id, lang, ctext) =>
      byId.get(id + 1).collect { case (_, l2, rtext) if l2 == lang =>
        (lang, ctext, rtext)
      }
    }
    assert(pairs.nonEmpty)
    def grams(t: String, n: Int): Seq[String] = {
      val toks = t.split(" ", -1).toSeq
      if (n == 1) toks
      else if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    val expected = (for {
      n <- Seq(1, 2)
      (lang, group) <- pairs.groupBy(_._1)
    } yield {
      val per = group.map { case (_, c, r) =>
        val cg = grams(c, n); val rg = grams(r, n)
        val ccnt = cg.groupBy(identity).map { case (k, v) => k -> v.size }
        val rcnt = rg.groupBy(identity).map { case (k, v) => k -> v.size }
        val ov = ccnt.map { case (k, v) => math.min(v, rcnt.getOrElse(k, 0)) }.sum
        (ov.toLong, cg.length.toLong, rg.length.toLong)
      }
      val ov = per.map(_._1).sum; val cl = per.map(_._2).sum
      val rl = per.map(_._3).sum
      (lang, n.toLong) -> (group.length.toLong, ov, r4d(ov.toDouble / cl),
        r4d(ov.toDouble / rl), r4d(2.0 * ov / (cl + rl)))
    }).toMap
    val rows = SurfaceR10cg.lt52Rouge(spark, sfDir).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (np, ov, p, rec, f1) = expected((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == np, s"${r.getString(0)} n_pairs")
      assert(r.getLong(3) == ov, s"${r.getString(0)} overlap")
      assert(math.abs(r.getDouble(4) - p) < 1e-12)
      assert(math.abs(r.getDouble(5) - rec) < 1e-12)
      assert(math.abs(r.getDouble(6) - f1) < 1e-12)
    }
  }

  test("m169: CCC is bounded by |r| and C_b lands in (0, 1]") {
    val row = SurfaceR10cg.m169LinCcc(spark, sfDir).collect().head
    val ccc = row.getDouble(1); val r = row.getDouble(2)
    val cb = row.getDouble(3)
    assert(math.abs(ccc) <= math.abs(r) + 1e-9, s"ccc=$ccc r=$r")
    assert(cb > 0.0 && cb <= 1.0 + 1e-9, s"cb=$cb")
    // Gross vs net dollars track closely: agreement is strong but the
    // discount shift keeps it strictly below precision.
    assert(r > 0.9 && ccc < r)
  }
}
