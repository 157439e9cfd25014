package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{GlobalRowId, PrefixSum}

/** Property tests: the range-partition ordinal/cumsum operators must
  * agree with the naive single-partition window on ARBITRARY inputs —
  * duplicates in the value column, negative values, skewed keys, sizes
  * around the partition-count boundary. The example-based specs pin
  * fixture behaviour; these pin the algebra. Sampling drives Gen
  * directly (scalatestplus is not on the offline classpath — same
  * idiom as PropertySpec).
  */
class PrefixSumPropertySpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private val rows: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 200)
    keys <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
    vals <- Gen.listOfN(n, Gen.choose(-50L, 50L))
  } yield keys.distinct.zip(vals) // unique keys: the operators' contract

  test("withRunningTotal equals the single-partition running sum for any input") {
    import spark.implicits._
    forAll(rows, 15) { data =>
      val df = data.toDF("k", "v")
      val got = PrefixSum
        .withRunningTotal(df, Seq("k"), "v", numPartitions = 7, outCol = "rt")
        .select("k", "rt").as[(Long, Long)].collect().toMap
      val want = df
        .withColumn("rt", sum("v").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("k", "rt").as[(Long, Long)].collect().toMap
      assert(got == want, s"running-total mismatch on n=${data.length}")
    }
  }

  test("withRunningTotals: N series in one pass each equal their solo form") {
    import spark.implicits._
    forAll(rows, 8) { data =>
      val df = data.toDF("k", "v").withColumn("w", col("v") * 2 + 1)
      val got = PrefixSum
        .withRunningTotals(df, Seq("k"), Seq("v" -> "rv", "w" -> "rw"),
          numPartitions = 5)
        .select("k", "rv", "rw").as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      val w = Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("rv", sum("v").over(w))
        .withColumn("rw", sum("w").over(w))
        .select("k", "rv", "rw").as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got == want, s"multi-series mismatch on n=${data.length}")
    }
  }

  test("withRowId equals the single-partition row_number for any unique-key input") {
    import spark.implicits._
    forAll(rows, 15) { data =>
      val df = data.toDF("k", "v")
      val got = GlobalRowId.withRowId(df, "k", numPartitions = 7)
        .select("k", "rowid").as[(Long, Long)].collect().toMap
      val want = df
        .withColumn("rowid",
          (row_number().over(Window.orderBy("k")) - 1).cast("long"))
        .select("k", "rowid").as[(Long, Long)].collect().toMap
      assert(got == want, s"rowid mismatch on n=${data.length}")
    }
  }
}
