package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named registry keys (default: the
  * headline bench subset) under the SAME session config Bench uses, so
  * plan files committed under plans/<round>/ describe what the bench
  * actually runs. Output is delimited per key for easy splitting.
  *
  * Usage: runMain graft.PlanDump <sfDir> [key ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.drop(1).toSeq else SparkEntry.benchQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown registry key: $name"))
      println(s"===== PLAN $name =====")
      try {
        val df = fn(spark, sfDir)
        // queryExecution.explainString mirrors df.explain("formatted")
        // but returns the text instead of printing, so it lands in our
        // delimited stdout block even under log capture.
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"PLAN FAILED: ${e.getMessage}")
      }
      println(s"===== END $name =====")
    }
    spark.stop()
  }
}
