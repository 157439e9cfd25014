package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 6, where one slow query past the driver's time
  * budget zeroed the whole round's correctness evidence:
  *  - oracle_sql.json is written FIRST, before any query runs, so a
  *    mid-drive failure can never erase the oracle map;
  *  - per-query wall seconds are logged to stderr;
  *  - every query runs on a disposable worker thread under
  *    SPARK_GRAFT_QUERY_BUDGET_S wall seconds (default 120; <=0
  *    disables) — on breach the job group is cancelled AND the worker
  *    thread interrupted (cancelJobGroup alone cannot unblock
  *    driver-side waits like streaming awaitTermination or iterative
  *    driver loops), the query is logged as TIMEOUT, and the drive
  *    CONTINUES with the remaining queries;
  *  - a timed-out or failed query's output directory is deleted, so the
  *    driver sees a MISSING result (scored as absent) instead of a
  *    partially-written parquet dir it would score as WRONG.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // default budget 120 s/query: the watchdog must engage on driver
    // runs without relying on the driver to export the env var (round-7
    // verdict #8); slowest r07 query was <10 s at sf0.01, so 120 s only
    // fires on a genuine wedge.
    val budgetS = sys.env.get("SPARK_GRAFT_QUERY_BUDGET_S")
      .map(_.toLong).orElse(Some(120L)).filter(_ > 0)
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
    val sc = spark.sparkContext
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      def wall = (System.nanoTime() - t0) / 1e9
      QueryGuard.run(sc, s"verify-$name", budgetS) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } match {
        case QueryGuard.Ok =>
          // non-vacuity guard: q9b is the flagship value-bearing cosine
          // query — threshold drift silently emptying it bit once in r01
          if (name == "q9b_cosine_selfjoin_t038" &&
              spark.read.parquet(s"$outDir/$name").isEmpty)
            System.err.println(s"[verify] $name VACUOUS: 0 rows — threshold drift?")
          System.err.println(f"[verify] $name ok $wall%.1fs")
        case QueryGuard.Timeout =>
          QueryGuard.deleteRec(new java.io.File(s"$outDir/$name"))
          System.err.println(s"[verify] $name TIMEOUT after ${budgetS.get}s — output removed, skipped")
        case QueryGuard.Failed(e) =>
          QueryGuard.deleteRec(new java.io.File(s"$outDir/$name"))
          System.err.println(f"[verify] $name failed after $wall%.1fs: ${e.getMessage}")
      }
      // Defined JVM state between queries (VERDICT r11 items 1-2): a
      // 604-query drive otherwise accumulates persist/localCheckpoint
      // residue in the block manager and late queries inherit a
      // degraded JVM. Plain (non-checkpoint) residue outside the named
      // multi-consumer allowlist is a lifecycle bug — named here.
      val swept = CacheLifecycle.sweep(spark)
      if (swept.plain > 0 && !CacheLifecycle.persistAllowlist(name))
        System.err.println(
          s"[verify] $name PERSIST LEAK: ${swept.plain} non-checkpoint cached RDD(s)")
    }
    spark.stop()
  }
}
