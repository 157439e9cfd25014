package graft

import org.apache.spark.sql.SparkSession

/** Isolated single-query probe: run ONE registry query N times in a
  * fresh JVM and print each wall (noop-forced, full computation). This
  * is how BASELINE.md's isolated bands are produced — in-bench probe
  * readings carry end-of-drive JVM heap state and whole-suite cache
  * history, so outliers there are adjudicated against THESE numbers
  * (the lj2 lesson from r8; ls3's band is VERDICT r10 item 5).
  *
  * Usage: runMain graft.Probe <queryKey> [sfDir] [reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse(
      sys.error("usage: Probe <queryKey> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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
    val fn = SparkEntry.queries.getOrElse(key,
      sys.error(s"unknown query key: $key"))
    val walls = (1 to reps).map { i =>
      // defined block-manager state per rep: without the sweep, rep 1's
      // persist/localCheckpoint residue warms (or taxes) reps 2..N and
      // the band stops being an isolated-cost measurement
      CacheLifecycle.sweep(spark)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $key run$i $w%.2fs")
      w
    }
    println(f"""{"probe":"$key","sf":"$sfDir","runs":[${
      walls.map(w => f"$w%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
