package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.DamerauLevenshtein

import graft.queries.SurfaceR11b

class SurfaceR11bSpec extends SparkSpec {

  private def d(a: String, b: String): Long =
    DamerauLevenshtein.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("every R11b query runs at sf0.001") {
    SurfaceR11b.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("damerau kernel: pinned cases (values cross-checked vs DuckDB)") {
    // unrestricted DL, not OSA: "CA"->"ABC" is 2 (OSA would say 3)
    assert(d("CA", "ABC") === 2L)
    assert(d("ab", "ba") === 1L)
    assert(d("abc", "ca") === 2L)
    assert(d("", "abc") === 3L)
    assert(d("abc", "") === 3L)
    assert(d("", "") === 0L)
    assert(d("kitten", "sitting") === 3L)
    assert(d("recieve", "receive") === 1L) // the typo class lf5 exists for
    assert(d("same", "same") === 0L)
  }

  test("damerau kernel laws: symmetry, <= levenshtein, swap discount") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def word() = (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val pairs = Seq.fill(300)((word(), word()))
    val lev = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b")).cast("long")).collect().map(_.getLong(0))
    pairs.zip(lev).foreach { case ((a, b), lv) =>
      assert(d(a, b) === d(b, a), s"asymmetric on ($a,$b)")
      assert(d(a, b) <= lv, s"dl > lev on ($a,$b)")
      assert(d(a, b) >= (a.length - b.length).abs, s"below length bound ($a,$b)")
    }
    // a pure adjacent swap always costs exactly 1
    assert(d("abcdef", "abdcef") === 1L)
    assert(d("abcdef", "bacdef") === 1L)
  }

  test("damerau kernel stays inside whole-stage codegen") {
    val df = Tables.part(spark, sfDir).select(col("p_name"))
      .select(expr("damerau_levenshtein(p_name, reverse(p_name))").as("x"))
    // the `*(n)` prefix is the whole-stage-codegen marker; the kernel's
    // Project must carry it (a UDF would have broken the span)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [damerau_levenshtein"), plan)
    assert(df.agg(max("x")).head.getLong(0) > 0L)
  }

  test("lf5: dl never exceeds lev and each pair is within the band") {
    val rows = SurfaceR11b.queries("lf5_damerau_pairs")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dl = r.getAs[Long]("dl"); val lv = r.getAs[Long]("lev")
      assert(dl >= 1 && dl <= 3, r.toString)
      assert(dl <= lv, r.toString)
    }
  }

  test("lf6: banding recall is 1.0 vs the naive all-pairs filter") {
    import spark.implicits._
    // naive spark-side reference over the same signatures
    Tables.documents(spark, sfDir).createOrReplaceTempView("graft_documents")
    val banded = SurfaceR11b.queries("lf6_simhash_hamming")(spark, sfDir)
      .select("a_id", "b_id", "ham").as[(Long, Long, Long)].collect().toSet
    val sig = spark.sql(
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id,
         |      explode(split(regexp_replace(lower(text), '^\\\\W+|\\\\W+$$', ''),
         |        '\\\\W+')) AS tok
         |    FROM graft_documents)
         |  WHERE length(tok) > 0)
         |SELECT doc_id, ${SurfaceR11b.sig60TermsForTest} AS sig
         |FROM toks GROUP BY doc_id""".stripMargin)
    val naive = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("ham"))
      .where(col("ham") <= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == naive,
      s"banding lost/invented pairs: banded=${banded.size} naive=${naive.size}")
    assert(banded.nonEmpty, "no candidate pairs at sf0.001 — fixture drift?")
  }
}
