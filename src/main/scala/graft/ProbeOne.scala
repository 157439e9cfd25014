package graft

import org.apache.spark.sql.SparkSession

/** Isolated probe runner: force ONE named registry query (noop write —
  * every column computed) in a fresh JVM and print the wall time. This
  * is the measurement harness behind BASELINE.md's "isolated fresh-JVM"
  * numbers: in-bench probe readings carry end-of-drive JVM heap state
  * plus whatever ran before them, so shape-to-shape comparisons (did
  * this rework actually speed the query up?) must come from one query
  * per JVM on an otherwise idle machine.
  *
  * Usage: runMain graft.ProbeOne <sfDir> <registryKey> [repeats]
  * With repeats > 1 the query is forced that many times in ONE JVM and
  * every reading printed: run 1 is the cold number (session + codegen
  * init included), later runs are warm and comparable to in-bench
  * probe readings. Config mirrors Bench (SPARK_GRAFT_CPUS, default 32
  * = the driver's local[32] shape).
  */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val repeats = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown registry key: $name"))
    (1 to repeats).foreach { r =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE_RESULT $name%s run$r%s $sec%.2f sec")
    }
    spark.stop()
  }
}
