package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 7: parse_url and observe metrics. */
class SurfaceR12gSpec extends SparkSpec {

  test("f30: parse_url inverts the construction on a hand URL") {
    val r = spark.sql(
      "SELECT parse_url(u, 'HOST') h, parse_url(u, 'PATH') p," +
        " parse_url(u, 'QUERY', 'lang') l FROM" +
        " (SELECT 'https://src7.example.com/docs/42?lang=en&ver=2' AS u)")
      .collect()(0)
    assert(r.getString(0) === "src7.example.com")
    assert(r.getString(1) === "/docs/42")
    assert(r.getString(2) === "en")
  }

  test("f30: every document lands in exactly one host bucket") {
    val out = queries.SurfaceR12g.f30ParseUrl(spark, sfDir)
    val total = out.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total === Tables.documents(spark, sfDir).count())
    assert(out.where(col("n_ver2") =!= col("n_docs")).count() === 0)
  }

  test("x20: observed metrics equal the re-aggregated truth") {
    val out = queries.SurfaceR12g.x20ObserveMetrics(spark, sfDir)
    val ref = Tables.lineitem(spark, sfDir)
      .agg(count(lit(1)).as("r"), sum(col("l_quantity").cast("long")).as("q"))
      .collect()(0)
    val row = out.collect()(0)
    assert(row.getAs[Long]("rows_seen") === ref.getLong(0))
    assert(row.getAs[Long]("qty_seen") === ref.getLong(1))
    // observed totals are constant across result rows
    assert(out.select("rows_seen", "qty_seen").distinct().count() === 1)
  }
}
