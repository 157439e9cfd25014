package graft

import org.apache.spark.sql.functions._

import graft.queries.{SurfaceR10, SurfaceR11g}

class SurfaceR11gSpec extends SparkSpec {

  test("every R11g query runs at sf0.001") {
    SurfaceR11g.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp79: concatenating each word's tokens reproduces the word") {
    val bad = SurfaceR11g.queries("lp79_bpe_apply")(spark, sfDir)
      .where(regexp_replace(col("tokens"), " ", "") =!= col("word"))
      .count()
    assert(bad == 0, s"$bad words whose tokens do not re-concatenate")
  }

  test("lp79: learned merges actually shorten the merged words") {
    import spark.implicits._
    val merges = SurfaceR10.queries("lt14_bpe_merges")(spark, sfDir)
      .select("pair").as[String].collect()
      .map(_.split(" ") match { case Array(x, y) => x + y })
    val enc = SurfaceR11g.queries("lp79_bpe_apply")(spark, sfDir)
      .select("word", "tokens", "n_tokens").as[(String, String, Long)]
      .collect()
    // every word's token count is at most its character count, and any
    // word containing a merged symbol as a token saved at least one slot
    enc.foreach { case (w, toks, n) =>
      assert(n <= w.length, s"$w tokenized LONGER than characters")
      val usesMerge = toks.split(" ").exists(merges.contains)
      if (usesMerge) assert(n < w.length, s"$w uses a merge but saved nothing")
    }
    assert(enc.exists(_._2.split(" ").exists(merges.contains)),
      "no word uses any learned merge — trainer/encoder disagree?")
  }

  test("lt76: KN probabilities are proper and the backoff discriminates") {
    import spark.implicits._
    val rows = SurfaceR11g.queries("lt76_kneser_ney")(spark, sfDir)
      .select("w1", "w2", "c12", "p_kn").as[(String, String, Long, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w1, w2, _, p) =>
      assert(p > 0 && p < 1, s"P($w2|$w1) = $p out of range")
    }
    // per context, reported mass cannot exceed 1 (the c12>=5 filter only
    // removes terms from the interpolated total)
    rows.groupBy(_._1).foreach { case (w1, rs) =>
      val mass = rs.map(_._4).sum
      assert(mass <= 1.0 + 1e-6, s"context $w1 mass $mass > 1")
    }
  }
}
