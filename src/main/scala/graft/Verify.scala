package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 6, where one slow query past the driver's time
  * budget zeroed the whole round's correctness evidence:
  *  - oracle_sql.json is written FIRST, before any query runs, so a
  *    mid-drive failure can never erase the oracle map;
  *  - per-query wall seconds are logged to stderr;
  *  - SPARK_GRAFT_QUERY_BUDGET_S (optional) bounds each query's wall
  *    time — on breach a watchdog cancels the query's job group, the
  *    query is logged as TIMEOUT, and the drive CONTINUES.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val budgetS = sys.env.get("SPARK_GRAFT_QUERY_BUDGET_S").map(_.toLong)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Oracle map FIRST: a hung/failed query later must not erase it.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val watchdog = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-verify-watchdog"); t.setDaemon(true); t
    }
    val sc = spark.sparkContext
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      @volatile var timedOut = false
      sc.setJobGroup(s"verify-$name", name, interruptOnCancel = true)
      val timer = budgetS.map { b =>
        watchdog.schedule(new Runnable {
          def run(): Unit = { timedOut = true; sc.cancelJobGroup(s"verify-$name") }
        }, b, TimeUnit.SECONDS)
      }
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // non-vacuity guard: q9b is the flagship value-bearing cosine
        // query — threshold drift silently emptying it bit once in r01
        if (name == "q9b_cosine_selfjoin_t038" &&
            spark.read.parquet(s"$outDir/$name").isEmpty)
          System.err.println(s"[verify] $name VACUOUS: 0 rows — threshold drift?")
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        if (timedOut)
          System.err.println(s"[verify] $name TIMEOUT after ${budgetS.get}s — skipped")
        else
          System.err.println(f"[verify] $name failed after ${(System.nanoTime() - t0) / 1e9}%.1fs: ${e.getMessage}")
      } finally {
        timer.foreach(_.cancel(false))
        sc.clearJobGroup()
      }
    }
    watchdog.shutdownNow()
    spark.stop()
  }
}
