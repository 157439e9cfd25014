package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10q

class SurfaceR10qSpec extends SparkSpec {

  test("every R10q query runs at sf0.001") {
    SurfaceR10q.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("s22: gzip files actually land and round-trip the 25 nations") {
    val rows = SurfaceR10q.s22CsvGzip(spark, sfDir).collect()
    assert(rows.length == 25)
    val gz = new java.io.File("target/tmp/s22_csv_gz")
      .listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(gz.nonEmpty, "no .csv.gz part files written")
  }

  test("lt26: 10 checkpoints; beta in (0,1); K positive") {
    val r = SurfaceR10q.lt26HeapsLaw(spark, sfDir).collect().head
    assert(r.getLong(0) == 10)
    val beta = r.getDouble(1)
    assert(beta > 0.0 && beta < 1.0, s"Heaps beta out of range: $beta")
    assert(r.getDouble(2) > 0.0)
  }

  test("lt26: fitted curve reproduces the final 3-gram vocab within 30%") {
    val r = SurfaceR10q.lt26HeapsLaw(spark, sfDir).collect().head
    val (beta, k) = (r.getDouble(1), r.getDouble(2))
    val toks = Tables.documents(spark, sfDir)
      .withColumn("tk", split(col("text"), " "))
      .where(size(col("tk")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 3), " +
          "i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2]))")).as("t"))
    val n = toks.count().toDouble
    val v = toks.distinct().count().toDouble
    val fitted = k * math.pow(n, beta)
    assert(math.abs(fitted - v) / v < 0.3,
      s"Heaps fit $fitted far from actual 3-gram vocab $v")
  }

  test("lg7: assortativity in [-1, 1] and edge count is even") {
    val r = SurfaceR10q.lg7Assortativity(spark, sfDir).collect().head
    assert(r.getLong(0) % 2 == 0, "directed edge count must be 2E")
    val a = r.getDouble(1)
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"r out of range: $a")
  }
}
