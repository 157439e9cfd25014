package graft

import org.apache.spark.sql.SparkSession

/** Registry-wide runtime gate: drive EVERY SparkEntry.queries entry at
  * a small SF under a per-query wall ceiling and FAIL BY NAME on any
  * breach. This is the tripwire round 6 lacked: the lt2 O(n²) frame ran
  * ~9 minutes at sf0.01 and silently zeroed the whole round's
  * correctness evidence — under this gate it would have been named in
  * seconds at sf0.001 and the run would have exited 1.
  *
  * Usage: runMain graft.Tripwire [sfDir]   (default /root/testdata/sf0.001)
  *   SPARK_GRAFT_TRIPWIRE_BUDGET_S  per-query ceiling, default 30
  *
  * Results are forced with a `noop`-format write (full computation of
  * every operator, no output, no count()-style column pruning), so a
  * scale-killer hiding in an unaggregated column still pays its cost.
  * Exit code 0 = all queries under ceiling; 1 = offenders listed on
  * stderr, one line each.
  */
object Tripwire {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val budgetS = sys.env.get("SPARK_GRAFT_TRIPWIRE_BUDGET_S")
      .map(_.toLong).getOrElse(30L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    var slowest = ("", 0.0)
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      def wall = (System.nanoTime() - t0) / 1e9
      QueryGuard.run(sc, s"tripwire-$name", Some(budgetS)) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } match {
        case QueryGuard.Ok =>
          if (wall > slowest._2) slowest = (name, wall)
          System.err.println(f"[tripwire] $name ok $wall%.1fs")
        case QueryGuard.Timeout =>
          offenders += s"$name TIMEOUT > ${budgetS}s"
          System.err.println(s"[tripwire] $name TIMEOUT > ${budgetS}s")
        case QueryGuard.Failed(e) =>
          offenders += s"$name FAILED: ${e.getMessage}"
          System.err.println(f"[tripwire] $name FAILED after $wall%.1fs: ${e.getMessage}")
      }
    }
    spark.stop()
    if (offenders.nonEmpty) {
      System.err.println(s"[tripwire] ${offenders.size} offender(s):")
      offenders.foreach(o => System.err.println(s"[tripwire]   $o"))
      sys.exit(1)
    }
    println(f"[tripwire] PASS: ${SparkEntry.queries.size} queries under ${budgetS}s " +
      f"(slowest ${slowest._1} ${slowest._2}%.1fs)")
  }
}
