package graft

import org.apache.spark.sql.functions._

class SetKernelsSpec extends SparkSpec {
  import graft.functions.SetFunctions.sortedIntersectCount

  private def cnt(a: Seq[String], b: Seq[String]): Long = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")).as("n"))
      .collect()(0).getLong(0)
  }

  test("sorted intersect count: overlap, disjoint, empty, identical, subsets") {
    assert(cnt(Seq("a", "c", "e"), Seq("b", "c", "d", "e")) == 2)
    assert(cnt(Seq("a", "b"), Seq("c", "d")) == 0)
    assert(cnt(Seq(), Seq("a")) == 0)
    assert(cnt(Seq(), Seq()) == 0)
    assert(cnt(Seq("a", "b", "c"), Seq("a", "b", "c")) == 3)
    assert(cnt(Seq("b"), Seq("a", "b", "c")) == 1)
  }

  test("sorted intersect count equals size(array_intersect) on random sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      def set() = (0 until (1 + rnd.nextInt(30)))
        .map(_ => "t" + rnd.nextInt(40)).distinct.sorted
      (i, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        sortedIntersectCount(col("a"), col("b")).as("kernel"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(df.where(col("kernel") =!= col("builtin")).count() == 0)
  }

  test("null input yields null, matching binary-expression conventions") {
    import spark.implicits._
    val df = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")).as("n"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("kernel stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(array(concat(lit("t"), col("id"))).as("a"),
        array(concat(lit("t"), col("id"))).as("b"))
      .select(sortedIntersectCount(col("a"), col("b")).as("n"))
    // the "*(n)" prefix on an operator marks its whole-stage-codegen
    // stage; the kernel's Project must carry one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("sorted_intersect_count") && l.trim.startsWith("*(")), plan)
    assert(df.agg(sum("n")).collect()(0).getLong(0) == 10L)
  }
}
