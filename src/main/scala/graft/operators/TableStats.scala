package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (min/max statistics per data file) and the
  * pruned read that consumes them — the data-skipping half of the
  * lakehouse story (the layout half is [[ZOrder]]).
  *
  * `collect` computes one row per data file with min/max for the named
  * LONG-valued stat columns; the caller persists that frame as a
  * sidecar next to the snapshot (see the q52/q53 registry keys). A
  * selective reader then calls `prunedPaths` with its predicate's
  * bounds, gets back only the files whose [min, max] zone intersects,
  * and scans just those — file-granularity partition pruning on
  * NON-partition columns, exactly the mechanism of Delta/Iceberg
  * data skipping and parquet row-group statistics, lifted to the
  * table layer where a manifest makes it one metadata read instead of
  * N footer opens.
  *
  * Scale shape: `collect` is one column-pruned scan of only the stat
  * columns at WRITE time (amortized into the commit); every subsequent
  * selective read touches `O(selectivity)` files instead of all of
  * them. The stats frame is one row per FILE — at 100 TB with 1 GB
  * files that is ~100 k rows, a broadcast-sized manifest. Pruning is
  * conservative-correct by construction: a file is skipped only when
  * its zone provably cannot contain a matching row, so the pruned scan
  * is hash-identical to the full scan + filter (the oracle proves it).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.11 + the 100 TB efficiency brief.
  */
object TableStats {

  /** One row per data file of `dir`: (path, n_rows, <c>_min, <c>_max
    * for each stat column). Stat columns must be integral/long-castable. */
  def collect(spark: SparkSession, dir: String, statCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      statCols.flatMap { c =>
        Seq(min(col(c).cast("bigint")).as(s"${c}_min"),
            max(col(c).cast("bigint")).as(s"${c}_max"))
      }
    spark.read.parquet(dir)
      .select(statCols.map(col): _*)
      .groupBy(input_file_name().as("path"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Closed-interval zone test: keep files whose [min, max] intersects
    * [lo, hi] on EVERY listed column (conjunctive box predicate). */
  def prunedPaths(
      stats: DataFrame,
      bounds: Seq[(String, Long, Long)]): Seq[String] = {
    val keep: Column = bounds.map { case (c, lo, hi) =>
      col(s"${c}_max") >= lo && col(s"${c}_min") <= hi
    }.reduce(_ && _)
    stats.where(keep).select("path").collect().map(_.getString(0)).toSeq
  }

  /** Scan only the zone-surviving files, then apply the exact predicate
    * (zones are necessary-condition filters, never sufficient). Returns
    * the pruned frame plus (filesRead, filesTotal) so callers can gate
    * on pruning actually engaging. */
  def readPruned(
      spark: SparkSession,
      stats: DataFrame,
      bounds: Seq[(String, Long, Long)]): (DataFrame, Int, Int) = {
    val total = stats.select("path").count().toInt
    val paths = prunedPaths(stats, bounds)
    val exact: Column = bounds.map { case (c, lo, hi) =>
      col(c).cast("bigint") >= lo && col(c).cast("bigint") <= hi
    }.reduce(_ && _)
    if (paths.isEmpty) {
      // A predicate entirely outside the data range legitimately prunes
      // EVERY file; the result is an empty frame, not an error — the
      // documented "hash-identical to full scan + filter" equivalence
      // must hold for empty selections too (ADVICE r13). One footer
      // read supplies the schema; `lit(false)` guarantees zero rows
      // without scanning a data page. Callers asserting that pruning
      // ENGAGED (read*2 < total) are unaffected: 0 < total still holds.
      val any = stats.select("path").limit(1).collect()
      require(any.nonEmpty, "TableStats.readPruned: stats frame lists no files")
      (spark.read.parquet(any(0).getString(0)).where(lit(false)), 0, total)
    } else {
      (spark.read.parquet(paths: _*).where(exact), paths.size, total)
    }
  }
}
