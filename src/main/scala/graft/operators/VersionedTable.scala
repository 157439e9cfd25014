package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot table over a plain parquet directory — the
  * minimal lakehouse contract (VERDICT r12 item 2): MERGE-writes
  * produce immutable numbered versions and any committed version can
  * be read back exactly (time travel), with readers never observing a
  * half-written commit.
  *
  * Layout:
  * {{{
  *   baseDir/
  *     v1/  v2/  v3/ ...        immutable parquet snapshot per version
  *     _graft_manifest          one committed version number per line,
  *                              ascending; REPLACED ATOMICALLY per commit
  * }}}
  *
  * Commit protocol (single-writer): write the new snapshot dir `v{n+1}`
  * COMPLETELY, then publish it by writing the new manifest to a temp
  * file and `ATOMIC_MOVE`-renaming it over `_graft_manifest`. A reader
  * resolves the manifest first and only ever lists versions whose data
  * dirs were fully written before the rename — a crash mid-snapshot
  * leaves an orphan `v{n+1}` dir that no manifest references (invisible
  * garbage, never a torn read). This is the same publish-by-rename
  * discipline Delta/Iceberg use for their log/metadata pointer;
  * multi-writer commit arbitration (optimistic CAS on the pointer)
  * needs an external coordinator and is out of scope.
  *
  * Snapshot-chain form: every version is a FULL snapshot, not a delta.
  * That makes read-as-of O(1) (read one dir, zero log replay) and lets
  * a hash check pin every version byte-for-byte; the cost is write
  * amplification proportional to table size. At 100 TB a production
  * table stores per-commit deltas plus periodic compacted checkpoints
  * (exactly what the lp26 CDC-apply + q33 SCD2 ops provide the replay
  * math for); the version/manifest/time-travel surface here is
  * unchanged by that storage choice. The merge itself is
  * [[MergeUpsert]] — one full-outer shuffle on the merge keys, the
  * at-scale MERGE plan.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.11 (pipeline/curation ops), VERDICT r12 item 2.
  */
object VersionedTable {

  private val ManifestName = "_graft_manifest"

  private def manifestPath(baseDir: String) = Paths.get(baseDir, ManifestName)

  /** Committed versions, ascending; empty if the table does not exist. */
  def versions(baseDir: String): Seq[Int] = {
    val p = manifestPath(baseDir)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      s.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    }
  }

  /** Latest committed version, or 0 for a nonexistent table. */
  def latestVersion(baseDir: String): Int =
    versions(baseDir).lastOption.getOrElse(0)

  private def publish(baseDir: String, vs: Seq[Int]): Unit = {
    val tmp = Paths.get(baseDir, s".$ManifestName.tmp")
    Files.write(tmp, vs.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(baseDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def snapshotDir(baseDir: String, version: Int): String =
    s"$baseDir/v$version"

  private def writeSnapshot(baseDir: String, version: Int, df: DataFrame): Int = {
    df.write.mode("errorifexists").parquet(snapshotDir(baseDir, version))
    publish(baseDir, versions(baseDir) :+ version)
    version
  }

  /** Create the table at version 1 from an initial snapshot. */
  def create(baseDir: String, df: DataFrame): Int = {
    require(versions(baseDir).isEmpty,
      s"VersionedTable.create: $baseDir already has committed versions")
    Files.createDirectories(Paths.get(baseDir))
    writeSnapshot(baseDir, 1, df)
  }

  /** MERGE `changes` into the latest snapshot and commit the result as
    * the next version (see [[MergeUpsert.mergeUpsert]] for the
    * matched/not-matched/delete contract). Returns the new version. */
  def writeVersion(
      spark: SparkSession,
      baseDir: String,
      changes: DataFrame,
      keys: Seq[String],
      deleteCol: Option[String] = None,
      validateUniqueKeys: Boolean = false): Int = {
    val current = latestVersion(baseDir)
    require(current > 0, s"VersionedTable.writeVersion: $baseDir has no v1 — create() first")
    val target = readAsOf(spark, baseDir, current)
    val merged = MergeUpsert.mergeUpsert(
      target, changes, keys, deleteCol, validateUniqueKeys)
    writeSnapshot(baseDir, current + 1, merged)
  }

  /** Time travel: read the exact committed snapshot `version`. */
  def readAsOf(spark: SparkSession, baseDir: String, version: Int): DataFrame = {
    require(versions(baseDir).contains(version),
      s"VersionedTable.readAsOf: version $version not in committed " +
        s"versions ${versions(baseDir).mkString("[", ",", "]")} of $baseDir")
    spark.read.parquet(snapshotDir(baseDir, version))
  }

  /** Latest snapshot (the plain-read a non-time-travel user does). */
  def read(spark: SparkSession, baseDir: String): DataFrame =
    readAsOf(spark, baseDir, latestVersion(baseDir))
}
