package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-commit storage for a versioned keyed table — the at-scale
  * sibling of [[VersionedTable]] (VERDICT r13 item 2). VersionedTable
  * commits a FULL snapshot per version: read-as-of is O(1) but every
  * commit rewrites the whole table — write amplification ∝ table size,
  * untenable at 100 TB. This layout commits per-version CHANGE files
  * plus a checkpoint snapshot every `checkpointEvery` commits, so
  * commit cost is ∝ the delta and read-as-of is one checkpoint scan
  * plus a bounded replay — exactly the Delta-log/Iceberg-manifest
  * storage trade, built from the ops this repo already proved: the
  * replay IS [[Upsert.applyCdc]] (the lp26 fold — one window pass by
  * key over checkpoint ∪ deltas, cost ∝ rows touched, regardless of
  * how many commits the chain holds).
  *
  * Layout:
  * {{{
  *   baseDir/
  *     _graft_manifest     committed versions, ascending; ATOMIC_MOVE-
  *                         published per commit (the VersionedTable
  *                         publish-by-rename discipline, shared code)
  *     _graft_delta_meta   keys + checkpoint cadence, written once at
  *                         create (layout facts a reader must know)
  *     c1/                 checkpoint parquet: the FULL state at v1
  *     d2/ d3/ …           per-version change files: table columns +
  *                         `_op` ∈ {U, D} (upsert / delete-by-key)
  *     c4/ …               periodic checkpoint (ALSO has d4 — the
  *                         change record stays, so the changelog is
  *                         complete at every version)
  * }}}
  *
  * Commit protocol: write `d{n+1}` (and `c{n+1}` when the cadence is
  * due) COMPLETELY, then publish the manifest — a crash mid-commit
  * leaves orphan dirs no manifest references, never a torn read
  * (identical guarantee to VersionedTable; the manifest rename is the
  * single visibility point for BOTH dirs of a checkpoint commit).
  *
  * Keyed contract: this storage mode REQUIRES a primary key (declared
  * at create) — a delta row replaces or deletes BY KEY, which is what
  * makes replay a window pass instead of positional bookkeeping. Key
  * tuples must be unique within each committed delta (validated,
  * ANSI-MERGE style) and non-null (asserted at commit — fail loudly,
  * the changes() lesson from ADVICE r13).
  *
  * Scale shape at 100 TB: commits write O(|delta|) bytes (the q64 key
  * requires this with a byte census against a full-snapshot twin);
  * `readAsOf` scans one checkpoint + ≤`checkpointEvery` deltas and
  * pays ONE shuffle on the key; `changelog` between versions is a
  * pure union of stored delta files — zero joins, the CDC-feed read
  * path that VersionedTable.changes needs a full-outer diff for.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.11 + the 100 TB efficiency brief, VERDICT r13 item 2.
  */
object DeltaChain {

  private val MetaName = "_graft_delta_meta"
  private val OpCol = "_op"

  /** A metadata-only schema change, applied at READ to files stored
    * before it (the Delta/Iceberg column-mapping contract — zero data
    * rewritten at 100 TB). Events are totally ordered by version (each
    * is its own commit), and a reader projects any stored file to any
    * later version's shape by folding the events between the two. */
  sealed trait SchemaEvent { def version: Int }

  /** ADD COLUMN: the column exists from `version` on; rows stored
    * before it backfill AT READ with `defaultSql` evaluated over the
    * row's own columns. */
  final case class AddedColumn(version: Int, name: String, defaultSql: String)
    extends SchemaEvent

  /** DROP COLUMN: the column is gone from `version` on. Old versions
    * keep the old shape (time travel below the drop still returns the
    * column); a later re-add of the SAME name is a fresh incarnation —
    * pre-drop values never leak into it. */
  final case class DroppedColumn(version: Int, name: String)
    extends SchemaEvent

  /** RENAME COLUMN: `from` becomes `to` at `version` — values carry
    * over; only the name moves. Old versions keep the old name. */
  final case class RenamedColumn(version: Int, from: String, to: String)
    extends SchemaEvent

  /** A CHECK constraint active from `version` on: every LATER
    * commit's upsert rows must satisfy `sql` (ANSI CHECK semantics —
    * a NULL predicate passes, only FALSE violates). Enforcement is at
    * the write boundary over the DELTA rows (the Delta Lake ADD
    * CONSTRAINT contract: existing data is not re-validated; the
    * add is metadata-only). */
  final case class Constraint(version: Int, name: String, sql: String)

  final case class Meta(
      keys: Seq[String],
      checkpointEvery: Int,
      schemaEvents: Seq[SchemaEvent] = Seq.empty,
      partitionCols: Seq[String] = Seq.empty,
      constraints: Seq[Constraint] = Seq.empty,
      constraintDrops: Seq[(Int, String)] = Seq.empty,
      kinds: Map[Int, String] = Map.empty) {
    /** The additions view (streaming backfill + history need it). */
    def addedCols: Seq[AddedColumn] =
      schemaEvents.collect { case a: AddedColumn => a }
  }

  private def metaPath(baseDir: String) = Paths.get(baseDir, MetaName)

  /** Table metadata: line 1 is `keys=<k1,k2>;every=<n>` (written once
    * at create); each later line is one event, tab-separated (column
    * names cannot contain tabs and a default expression with a
    * literal tab is rejected at [[addColumn]]):
    * `addcol<TAB>version<TAB>name<TAB>defaultSql`,
    * `dropcol<TAB>version<TAB>name`,
    * `renamecol<TAB>version<TAB>from<TAB>to`,
    * `constraint<TAB>version<TAB>name<TAB>sql`,
    * `dropconstraint<TAB>version<TAB>name`, or
    * `kind<TAB>version<TAB>kind` (the operation KIND recorded at
    * commit time for commits whose artifacts alone can't name it —
    * optimize / restore; ADVICE r15). No JSON parser dependency,
    * atomically replaced per change. */
  def meta(baseDir: String): Meta = {
    val lines = new String(Files.readAllBytes(metaPath(baseDir)),
      StandardCharsets.UTF_8).split("\n").map(_.trim).filter(_.nonEmpty)
    val fields = lines.head.split(";").map { f =>
      val Array(k, v) = f.split("=", 2); k -> v
    }.toMap
    // ignore event lines bound to versions ABOVE the committed head —
    // with the manifest-first ordering such a line cannot normally
    // exist, but a hand-edited or partially-restored meta file must
    // not conjure a column no commit carries (ADVICE r14).
    // `<= latest`, not manifest membership: truncate drops old
    // versions from the manifest while their columns live on.
    val latest = latestVersion(baseDir)
    val events: Seq[SchemaEvent] = lines.tail.flatMap { l =>
      if (l.startsWith("addcol\t")) {
        val Array(_, v, n, d) = l.split("\t", 4)
        Some(AddedColumn(v.toInt, n, d))
      } else if (l.startsWith("dropcol\t")) {
        val Array(_, v, n) = l.split("\t", 3)
        Some(DroppedColumn(v.toInt, n))
      } else if (l.startsWith("renamecol\t")) {
        val Array(_, v, f, t) = l.split("\t", 4)
        Some(RenamedColumn(v.toInt, f, t))
      } else None
    }.toSeq.filter(_.version <= latest).sortBy(_.version)
    val parts = fields.get("parts").toSeq
      .flatMap(_.split(",").toSeq).filter(_.nonEmpty)
    val cons = lines.tail.filter(_.startsWith("constraint\t")).map { l =>
      val Array(_, v, n, sql) = l.split("\t", 4)
      Constraint(v.toInt, n, sql)
    }.toSeq.filter(_.version <= latest).sortBy(_.version)
    val droppedC = lines.tail.filter(_.startsWith("dropconstraint\t")).map { l =>
      val Array(_, v, n) = l.split("\t", 3)
      (v.toInt, n)
    }.toSeq.filter(_._1 <= latest)
    val kinds = lines.tail.filter(_.startsWith("kind\t")).map { l =>
      val Array(_, v, k) = l.split("\t", 3)
      v.toInt -> k
    }.toSeq.filter(_._1 <= latest).toMap
    Meta(fields("keys").split(",").toSeq, fields("every").toInt, events, parts,
      cons, droppedC, kinds)
  }

  /** The constraints the NEXT commit must enforce: per name, the
    * latest add/drop event wins (a dropped name may be re-added). */
  private def activeConstraints(m: Meta): Seq[Constraint] =
    m.constraints.filter { c =>
      val laterAdd = m.constraints.exists(o => o.name == c.name && o.version > c.version)
      val laterDrop = m.constraintDrops.exists { case (v, n) => n == c.name && v > c.version }
      !laterAdd && !laterDrop
    }

  private def rewriteMeta(baseDir: String, content: String): Unit = {
    val tmp = Paths.get(baseDir, s".$MetaName.tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaPath(baseDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Project a frame STORED at version `storedV` to the logical shape
    * at `upTo`: fold every schema event in (storedV, upTo] in version
    * order — an add backfills `defaultSql` over the frame's own
    * (already-projected) columns, a drop removes the column (its
    * values are destroyed, so a later re-add of the same name
    * backfills fresh — pre-drop values never leak), a rename moves
    * the values under the new name. Because the fold applies events
    * in order, each add's default evaluates against the column NAMES
    * as of its own version — a default authored before a later rename
    * still resolves. */
  private def projectTo(
      df: DataFrame, m: Meta, storedV: Int, upTo: Int): DataFrame =
    m.schemaEvents.filter(e => e.version > storedV && e.version <= upTo)
      .foldLeft(df) { (d, e) =>
        e match {
          case AddedColumn(_, n, dflt) =>
            if (d.columns.contains(n)) d else d.withColumn(n, expr(dflt))
          case DroppedColumn(_, n)    => d.drop(n)
          case RenamedColumn(_, f, t) => d.withColumnRenamed(f, t)
        }
      }

  /** The table's column list as of `version`: the latest checkpoint's
    * stored columns with every later metadata event folded in. */
  private def tableColsAt(
      spark: SparkSession,
      baseDir: String,
      m: Meta,
      version: Int): Seq[String] = {
    val cp = diskCheckpoints(baseDir).filter(_ <= version).max
    val base = checkpointSchema(spark, baseDir, cp).fieldNames.toSeq
    m.schemaEvents.filter(e => e.version > cp && e.version <= version)
      .foldLeft(base) { (cols, e) =>
        e match {
          case AddedColumn(_, n, _) =>
            if (cols.contains(n)) cols else cols :+ n
          case DroppedColumn(_, n)    => cols.filterNot(_ == n)
          case RenamedColumn(_, f, t) => cols.map(c => if (c == f) t else c)
        }
      }
  }

  private val SchemaSidecar = "_graft_schema"

  /** The checkpoint's stored schema — from the DDL sidecar written
    * with it (authoritative: survives Hive partition-column type
    * inference, readable even when the state was empty; ADVICE r15),
    * falling back to the parquet footer for pre-sidecar checkpoints. */
  private def checkpointSchema(
      spark: SparkSession,
      baseDir: String,
      v: Int): org.apache.spark.sql.types.StructType = {
    val p = Paths.get(checkpointDir(baseDir, v), SchemaSidecar)
    if (Files.exists(p))
      org.apache.spark.sql.types.StructType.fromDDL(
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else spark.read.parquet(checkpointDir(baseDir, v)).schema
  }

  /** Read checkpoint `v` under its recorded schema — partition-column
    * TYPES come from the sidecar, never from Hive dir-name inference
    * (which would silently retype a numeric-looking string partition
    * value, e.g. '01' -> 1, and corrupt replay; ADVICE r15). */
  private def readCheckpoint(
      spark: SparkSession, baseDir: String, v: Int): DataFrame = {
    val p = Paths.get(checkpointDir(baseDir, v), SchemaSidecar)
    if (Files.exists(p))
      spark.read.schema(checkpointSchema(spark, baseDir, v))
        .parquet(checkpointDir(baseDir, v))
    else spark.read.parquet(checkpointDir(baseDir, v))
  }

  def versions(baseDir: String): Seq[Int] = VersionedTable.versions(baseDir)
  def latestVersion(baseDir: String): Int = VersionedTable.latestVersion(baseDir)

  private def checkpointDir(baseDir: String, v: Int) = s"$baseDir/c$v"
  private def deltaDir(baseDir: String, v: Int) = s"$baseDir/d$v"
  private def hasCheckpoint(baseDir: String, v: Int): Boolean =
    Files.exists(Paths.get(checkpointDir(baseDir, v)))

  /** Create the table at version 1: one checkpoint, no delta.
    *
    * `partitionBy` (the 100 TB layout knob): checkpoints — the BIG
    * scans every read pays — are written Hive-partitioned on these
    * columns, so a partition-filtered `readAsOf` prunes checkpoint
    * FILES at planning time (the q71 key asserts it from inputFiles).
    * Deltas stay UNpartitioned deliberately: they are small by the
    * storage form's own contract (∝ batch), an empty change record
    * (addColumn/optimize) must stay schema-readable (a partitioned
    * empty write leaves no footer to read), and the streaming change
    * feed reads delta files whose partition values would otherwise
    * live only in dir names. */
  def create(
      baseDir: String,
      df: DataFrame,
      keys: Seq[String],
      checkpointEvery: Int = 4,
      partitionBy: Seq[String] = Seq.empty): Int = {
    require(versions(baseDir).isEmpty,
      s"DeltaChain.create: $baseDir already has committed versions")
    require(keys.nonEmpty && keys.forall(df.columns.contains),
      s"DeltaChain.create: keys ${keys.mkString(",")} must be table columns")
    require(checkpointEvery >= 1, "DeltaChain.create: checkpointEvery >= 1")
    require(partitionBy.forall(df.columns.contains),
      s"DeltaChain.create: partition cols ${partitionBy.mkString(",")} " +
        "must be table columns")
    require(partitionBy.forall(c => !keys.contains(c)) || partitionBy.isEmpty,
      "DeltaChain.create: partitioning on a key column partitions every " +
        "upsert to a singleton dir — pick a coarser column")
    Files.createDirectories(Paths.get(baseDir))
    writeCheckpoint(df, baseDir, 1, partitionBy)
    val partsLine =
      if (partitionBy.isEmpty) "" else s";parts=${partitionBy.mkString(",")}"
    Files.write(metaPath(baseDir),
      s"keys=${keys.mkString(",")};every=$checkpointEvery$partsLine"
        .getBytes(StandardCharsets.UTF_8))
    VersionedTable.publishManifest(baseDir, Seq(1))
    1
  }

  private def writeCheckpoint(
      df: DataFrame, baseDir: String, v: Int, parts: Seq[String]): Unit = {
    val dir = checkpointDir(baseDir, v)
    val w = df.write.mode("errorifexists")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(dir)
    // A partitioned write of an EMPTY state leaves no parquet footer at
    // all (no partition dirs land) — the anchor would be unreadable for
    // every later tableColsAt/readAsOf. Land one empty, UNpartitioned
    // file carrying the full schema as the readable sentinel; the dir
    // is immutable per version, so the mixed layout never accretes
    // (ADVICE r15).
    if (parts.nonEmpty && !hasParquetUnder(new java.io.File(dir)))
      df.limit(0).coalesce(1).write.mode("append").parquet(dir)
    // Schema sidecar: the authoritative read schema for this
    // checkpoint — partition-column types survive the Hive round-trip
    // (dir-name inference would retype '01' -> 1), and an empty
    // sentinel stays typed. Written before the manifest publish, so a
    // reader never resolves a checkpoint without it.
    Files.write(Paths.get(dir, SchemaSidecar),
      df.schema.toDDL.getBytes(StandardCharsets.UTF_8))
  }

  private def hasParquetUnder(f: java.io.File): Boolean =
    if (f.isDirectory)
      Option(f.listFiles()).exists(_.exists(hasParquetUnder))
    else f.getName.endsWith(".parquet")

  /** Commit a change batch as the next version. `delta` carries every
    * table column plus, optionally, a boolean `deleteCol`: true rows
    * delete their key, all others upsert (replace-or-insert whole-row,
    * the MERGE vocabulary). CONTRACT (ADVICE r14): a delete of an
    * ABSENT key is a no-op — CDC-apply semantics ([[Upsert.applyCdc]]
    * replay), idempotent under at-least-once redelivery. That differs
    * from ANSI MERGE's default, where a not-matched delete-flagged row
    * INSERTS; the snapshot form matches this contract when
    * [[VersionedTable.writeVersion]] is called with
    * `insertUnmatchedDeletes = false` (DeleteAbsentSemanticsSpec pins
    * the equivalence). Bytes written ∝ |delta|, plus a full
    * checkpoint when the cadence is due. Returns the new version. */
  def commitDelta(
      spark: SparkSession,
      baseDir: String,
      delta: DataFrame,
      deleteCol: Option[String] = None): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(current > 0, s"DeltaChain.commitDelta: $baseDir has no v1 — create() first")
    val lastCp = diskCheckpoints(baseDir).max // disk view: see truncate
    // the authoritative column list = latest checkpoint footer plus
    // metadata-only additions — one metadata read, never a replay
    val tableCols = tableColsAt(spark, baseDir, m, current)
    val next = current + 1
    // STAGE ONCE, validate from the staged files, atomically rename into
    // place: the caller's delta lineage is computed exactly once (the
    // old validate-then-write order ran it twice — once for the
    // validation aggregate, once for the write). A failed validation
    // deletes the staging dir and throws with nothing committed; a
    // crash in between leaves only a janitor-swept `.stage_d_*` dir.
    val shaped = shape(delta, tableCols, deleteCol, "DeltaChain.commitDelta")
    val staging = Paths.get(baseDir,
      s".stage_d_${java.util.UUID.randomUUID().toString.take(12)}")
    shaped.write.mode("errorifexists").parquet(staging.toString)
    try validateStaged(spark, staging.toString, m.keys,
      "DeltaChain.commitDelta", activeConstraints(m))
    catch { case t: Throwable => deleteStagingRecursively(staging); throw t }
    Files.move(staging, Paths.get(deltaDir(baseDir, next)),
      StandardCopyOption.ATOMIC_MOVE)
    if (next - lastCp >= m.checkpointEvery) {
      // materialize by replaying from the last checkpoint INCLUDING the
      // just-written delta dir (readable before publish — the manifest,
      // not dir existence, is the reader-visibility point)
      writeCheckpoint(replay(spark, baseDir, lastCp, next, tableCols, m.keys),
        baseDir, next, m.partitionCols)
    }
    VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
    next
  }

  /** Shape a caller delta to (table columns + `_op`) — the PLAN-TIME
    * half of the write boundary: exact column-set checks fail before
    * any data is computed. */
  private def shape(
      delta: DataFrame,
      tableCols: Seq[String],
      deleteCol: Option[String],
      who: String): DataFrame = {
    require(tableCols.forall(delta.columns.contains),
      s"$who: delta must carry every table column " +
        s"(${tableCols.mkString(",")}); has ${delta.columns.mkString(",")}")
    // EXACT column set, not subset (ADVICE r14): a silent select of
    // tableCols would drop any extra column — a caller that misspells
    // a newly added column (or forgot addColumn) loses that data with
    // no error, contrary to this module's fail-loudly write boundary.
    val allowed = tableCols.toSet ++ deleteCol
    val unexpected = delta.columns.filterNot(allowed.contains)
    require(unexpected.isEmpty,
      s"$who: delta carries column(s) the table does not have: " +
        s"${unexpected.mkString(",")} — addColumn first, or drop them " +
        "explicitly (a silent drop here would lose data)")
    val op = deleteCol match {
      case Some(d) => when(col(d), lit("D")).otherwise(lit("U"))
      case None    => lit("U")
    }
    delta.select(tableCols.map(col) :+ op.as(OpCol): _*)
  }

  /** Enforce the ANSI-MERGE write-boundary preconditions over a STAGED
    * delta dir, fail-loudly: unique key tuples per commit (a duplicate
    * would tie on `_seq` and replay one of the two
    * nondeterministically), non-null keys (the replay window GROUPS
    * null keys — legal — but a caller deleting "key = null" almost
    * always holds a data bug), and every active CHECK constraint.
    *
    * Runs AFTER the staging write (guide §1.2: the caller's delta
    * lineage is computed ONCE — the old validate-then-write order
    * recomputed an arbitrary upstream plan twice per commit). Reading
    * the staged parquet back prunes to keys + constraint columns +
    * `_op`, so validation cost is ∝ staged key/constraint bytes, not
    * the delta's full compute. The caller deletes the staging dir on
    * failure — nothing is committed (the manifest, not dir existence,
    * is the reader-visibility point, and `.stage_d_*` dirs are
    * janitor-swept). */
  private def validateStaged(
      spark: SparkSession,
      stagedDir: String,
      keys: Seq[String],
      who: String,
      constraints: Seq[Constraint] = Seq.empty): Unit = {
    // ONE validation aggregate carries the key checks AND every active
    // CHECK constraint's violation count (ANSI semantics: NULL passes,
    // only FALSE violates; delete rows are exempt — they carry the
    // writer's payload for a row leaving the table)
    val conCounts: Seq[org.apache.spark.sql.Column] = constraints.map { c =>
      count(when(col(OpCol) === "U" && (expr(c.sql) <=> lit(false)), 1))
    }
    val counted = spark.read.parquet(stagedDir)
      .agg(count(lit(1)), countDistinct(keys.head, keys.tail: _*) +:
        count(when(keys.map(col(_).isNull).reduce(_ || _), 1)) +:
        conCounts: _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Long])
    val Seq(total, distinct, nullKeys) = counted.take(3)
    require(nullKeys == 0,
      s"$who: $nullKeys delta row(s) carry a NULL key on (${keys.mkString(",")})")
    require(total == distinct,
      s"$who: ${total - distinct} duplicate key row(s) " +
        s"in the delta on (${keys.mkString(",")})")
    constraints.zip(counted.drop(3)).foreach { case (c, violations) =>
      require(violations == 0,
        s"$who: $violations delta row(s) violate CHECK constraint " +
          s"'${c.name}' (${c.sql}) — nothing was committed")
    }
  }

  /** Checkpoint `fromCp` + deltas (fromCp, to] → the exact state at
    * `to`: tag the checkpoint seq=fromCp op=I and each delta with its
    * version as seq, then one [[Upsert.applyCdc]] window pass by key
    * keeps the last write per key and drops deleted keys. ONE shuffle,
    * chain length only widens the union — the lp26 fold. */
  private def replay(
      spark: SparkSession,
      baseDir: String,
      fromCp: Int,
      to: Int,
      tableCols: Seq[String],
      keys: Seq[String]): DataFrame = {
    val m = meta(baseDir)
    val cp = projectTo(readCheckpoint(spark, baseDir, fromCp), m, fromCp, to)
      .select(tableCols.map(col) :+ lit("I").as(OpCol): _*)
      .withColumn("_seq", lit(fromCp))
    val deltas = ((fromCp + 1) to to).map { v =>
      projectTo(spark.read.parquet(deltaDir(baseDir, v)), m, v, to)
        .select(tableCols.map(col) :+ col(OpCol): _*)
        .withColumn("_seq", lit(v))
    }
    val all = deltas.foldLeft(cp)(_.unionByName(_))
    Upsert.applyCdc(all, keys, "_seq", OpCol).select(tableCols.map(col): _*)
  }

  /** Time travel: nearest checkpoint at-or-below `version` + replay.
    * Hash-identical to a full snapshot of the same chain (the q64
    * oracle-checked equivalence). */
  def readAsOf(spark: SparkSession, baseDir: String, version: Int): DataFrame = {
    require(versions(baseDir).contains(version),
      s"DeltaChain.readAsOf: version $version not in committed " +
        s"versions ${versions(baseDir).mkString("[", ",", "]")} of $baseDir")
    if (hasCheckpoint(baseDir, version))
      readCheckpoint(spark, baseDir, version)
    else {
      // disk-based resolution: after truncate the anchor checkpoint
      // may outlive its manifest entry (see [[truncate]])
      val cp = diskCheckpoints(baseDir).filter(_ <= version).max
      val m = meta(baseDir)
      replay(spark, baseDir, cp, version,
        tableColsAt(spark, baseDir, m, version), m.keys)
    }
  }

  /** Latest state. */
  def read(spark: SparkSession, baseDir: String): DataFrame =
    readAsOf(spark, baseDir, latestVersion(baseDir))

  /** The stored change feed between two committed versions: a pure
    * union of the delta files in (fromVersion, toVersion], each row
    * tagged `_commit_version` and `_change_type` ∈ {upsert, delete}.
    * ZERO joins — this is the read path a CDC consumer wants, and the
    * structural advantage over [[VersionedTable.changes]]'s full-outer
    * snapshot diff: cost ∝ change bytes, never table size. (Upsert is
    * not split into insert vs update_pre/postimage here because the
    * pre-state is not stored with the delta; consumers needing
    * preimages join against `readAsOf(fromVersion)`.) */
  def changelog(
      spark: SparkSession,
      baseDir: String,
      fromVersion: Int,
      toVersion: Int): DataFrame = {
    val vs = versions(baseDir)
    require(fromVersion < toVersion && vs.contains(fromVersion) && vs.contains(toVersion),
      s"DeltaChain.changelog: need committed fromVersion < toVersion, " +
        s"got $fromVersion, $toVersion of ${vs.mkString("[", ",", "]")}")
    val m = meta(baseDir)
    ((fromVersion + 1) to toVersion)
      .map { v =>
        // pre-event deltas project like every other reader, so a
        // window spanning a schema change unions cleanly and the
        // consumer sees one schema (the window-end's)
        projectTo(spark.read.parquet(deltaDir(baseDir, v)), m, v, toVersion)
          .withColumn("_commit_version", lit(v))
      }
      .reduce(_.unionByName(_))
      .withColumn("_change_type",
        when(col(OpCol) === "D", lit("delete")).otherwise(lit("upsert")))
      .drop(OpCol)
  }

  /** The full Delta-CDF vocabulary for ONE commit — stored delta rows
    * enriched with preimages recovered from the PRIOR version's state:
    * insert / delete / update_preimage / update_postimage, exactly
    * [[VersionedTable.changes]]'s contract. Structurally cheaper than
    * the snapshot diff: the join's build side is the DELTA (small by
    * construction — AQE broadcasts it), so the prior state is PROBED,
    * never shuffled — cost ∝ delta + one state read, not two
    * full-table shuffles. The prior STATE is the authority for
    * preimage payloads (a delete row's stored payload is whatever the
    * writer happened to send; the state is what the table actually
    * held), and a stored delete of an absent key emits nothing — the
    * replay no-op surfaces as a CDF no-op, consistently. */
  def changesAt(spark: SparkSession, baseDir: String, version: Int): DataFrame = {
    require(version >= 2 && versions(baseDir).contains(version),
      s"DeltaChain.changesAt: need a committed version >= 2, got $version " +
        s"of ${versions(baseDir).mkString("[", ",", "]")}")
    val m = meta(baseDir)
    val prev = readAsOf(spark, baseDir, version - 1)
    val dataCols = prev.columns.toSeq
    val old = prev.select(dataCols.map(c => col(c).as(s"__old_$c")): _*)
      .withColumn("__graft_in_prev", lit(true))
    val d = projectTo(
      spark.read.parquet(deltaDir(baseDir, version)), m, version, version)
    val joinCond = m.keys.map(k => col(k) <=> col(s"__old_$k")).reduce(_ && _)
    val joined = d.join(old, joinCond, "left_outer")
    val present = col("__graft_in_prev").isNotNull
    def newShape(tag: String) =
      dataCols.map(col) :+ lit(tag).as("_change_type")
    def oldShape(tag: String) =
      dataCols.map(c => col(s"__old_$c").as(c)) :+ lit(tag).as("_change_type")
    val inserts = joined.where(col(OpCol) === "U" && !present)
      .select(newShape("insert"): _*)
    val updPre = joined.where(col(OpCol) === "U" && present)
      .select(oldShape("update_preimage"): _*)
    val updPost = joined.where(col(OpCol) === "U" && present)
      .select(newShape("update_postimage"): _*)
    val deletes = joined.where(col(OpCol) === "D" && present)
      .select(oldShape("delete"): _*)
    inserts.unionByName(updPre).unionByName(updPost).unionByName(deletes)
  }

  /** OPTIMIZE (small-file compaction) for the delta form — VERDICT
    * r14 item 2, the missing lifecycle step for t28-style streaming
    * ingest, which commits one small delta dir per micro-batch. The
    * commit writes ONE empty change record (`d{next}` — a data no-op,
    * so the changelog contract is untouched: zero rows contributed)
    * plus a FORCED checkpoint `c{next}` holding the full state
    * bin-packed into `numFiles` files. After it, the head read is one
    * compact checkpoint scan instead of anchor-checkpoint + the whole
    * small-file delta run; every COMMITTED version still replays from
    * its original anchor, byte-identical (history preserved — the q69
    * key REQUIREs hash-identity across all versions, files ↓ at head).
    * Old small files are reclaimed later by [[truncate]] once the new
    * checkpoint becomes the anchor — the same two-step
    * OPTIMIZE-then-VACUUM lifecycle Delta/Iceberg run. At 100 TB,
    * partition this by table region (the operator compacts whatever
    * the chain holds; a production scheduler runs it per partition).
    * Returns the new version. */
  def optimize(spark: SparkSession, baseDir: String, numFiles: Int = 1): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(current > 0, s"DeltaChain.optimize: $baseDir has no v1 — create() first")
    require(numFiles >= 1, "DeltaChain.optimize: numFiles >= 1")
    val lastCp = diskCheckpoints(baseDir).max
    val tableCols = tableColsAt(spark, baseDir, m, current)
    val next = current + 1
    // the empty change record keeps the every-version-has-d{v}
    // invariant and makes the optimize commit changelog-neutral
    writeEmptyChangeRecord(spark, baseDir, m, current, tableCols, next)
    writeCheckpoint(
      replay(spark, baseDir, lastCp, next, tableCols, m.keys)
        .coalesce(numFiles),
      baseDir, next, m.partitionCols)
    VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
    // kind recorded AT COMMIT, manifest-first (ADVICE r15): history()
    // must never have to infer "optimize" from the empty-delta+
    // checkpoint artifact shape — a legitimate zero-row data delta
    // landing on the checkpoint cadence has the same artifacts
    appendMetaLine(baseDir, s"kind\t$next\toptimize")
    next
  }

  /** A zero-row change record carrying exactly `tableCols` + `_op` —
    * the schema-bearing `d{v}` every metadata-only commit writes
    * (keeps the every-version-has-d{v} replay/changelog invariant). */
  private def writeEmptyChangeRecord(
      spark: SparkSession,
      baseDir: String,
      m: Meta,
      current: Int,
      tableCols: Seq[String],
      next: Int,
      transform: DataFrame => DataFrame = identity): Unit = {
    val cp = diskCheckpoints(baseDir).max
    transform(projectTo(readCheckpoint(spark, baseDir, cp), m, cp, current)
        .where(lit(false)))
      .select(tableCols.map(col) :+ lit("U").as(OpCol): _*)
      .coalesce(1)
      .write.mode("errorifexists").parquet(deltaDir(baseDir, next))
  }

  private def appendMetaLine(baseDir: String, line: String): Unit = {
    val raw = new String(Files.readAllBytes(metaPath(baseDir)),
      StandardCharsets.UTF_8)
    rewriteMeta(baseDir, raw.stripSuffix("\n") + s"\n$line\n")
  }

  /** OPTIMIZE … ZORDER BY (x, y) for the delta form — [[optimize]]
    * with the forced checkpoint Morton-clustered on two key columns
    * ([[ZOrder.cluster]]: one range shuffle) instead of bin-packed by
    * coalesce, so zone maps on the compacted head prune on BOTH
    * columns. Same commit shape (empty change record + checkpoint),
    * same history/changelog neutrality; rows are unchanged, only
    * layout moves. Returns the new version. */
  def optimizeClustered(
      spark: SparkSession,
      baseDir: String,
      xCol: String,
      yCol: String,
      numFiles: Int): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(current > 0,
      s"DeltaChain.optimizeClustered: $baseDir has no v1 — create() first")
    val lastCp = diskCheckpoints(baseDir).max
    val tableCols = tableColsAt(spark, baseDir, m, current)
    require(Seq(xCol, yCol).forall(tableCols.contains),
      s"DeltaChain.optimizeClustered: ($xCol, $yCol) must be table columns")
    val next = current + 1
    writeEmptyChangeRecord(spark, baseDir, m, current, tableCols, next)
    writeCheckpoint(
      ZOrder.cluster(
        replay(spark, baseDir, lastCp, next, tableCols, m.keys),
        xCol, yCol, numFiles),
      baseDir, next, m.partitionCols)
    VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
    appendMetaLine(baseDir, s"kind\t$next\toptimize")
    next
  }

  /** Batched CDF over a version RANGE in ONE replay + ONE window pass
    * — the flat-slope fix for per-version [[changesAt]] loops (VERDICT
    * r14 item 4): changesAt(v) replays readAsOf(v−1) from the anchor
    * checkpoint EVERY call, so maintaining a view across k versions
    * costs O(k²) delta reads; here the checkpoint and every delta in
    * (anchor, toVersion] union ONCE, and a per-key `lag` over the
    * commit sequence recovers each change row's preimage — the
    * previous write to that key IS the key's state at v−1, because a
    * commit holds at most one row per key (the write-boundary
    * uniqueness REQUIRE). Emits exactly ⋃ changesAt(v) for v in
    * (fromVersion, toVersion] — same vocabulary (insert / delete /
    * update_preimage / update_postimage, state-authoritative
    * preimages, no-op deletes dropped), each row tagged
    * `_commit_version` (q66b REQUIREs the set-equivalence in-key).
    * ONE shuffle on the key; chain length only widens the union. */
  /** Parquet bytes in one chain directory — file listing only, no data
    * read; the currency of [[rangePruneActive]]'s guard. */
  private def dirParquetBytes(dir: String): Long =
    Option(new java.io.File(dir).listFiles())
      .map(_.filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.length()).sum)
      .getOrElse(0L)

  /** [[changesRange]]'s touched-key-prune decision, from file metadata
    * alone: prune only when the emission window's delta bytes are under
    * 1/4 of the bytes the replay scans regardless (anchor checkpoint +
    * every delta since it). Exposed to the bench so the cdf_range probe
    * can report which arm ran next to its timing. */
  private[graft] def rangePruneActive(
      baseDir: String, fromVersion: Int, toVersion: Int): Boolean = {
    val cpv = diskCheckpoints(baseDir).filter(_ <= fromVersion).max
    val windowBytes = ((fromVersion + 1) to toVersion)
      .map(v => dirParquetBytes(deltaDir(baseDir, v))).sum
    val scanBytes = dirParquetBytes(checkpointDir(baseDir, cpv)) +
      ((cpv + 1) to toVersion).map(v => dirParquetBytes(deltaDir(baseDir, v))).sum
    windowBytes * 4L < scanBytes
  }

  /** The bytes a [[restore]] to `toVersion` scans at the CURRENT head
    * (anchor checkpoint + every delta since it) — file listing only, no
    * data read. VERDICT r17 "what's wrong" #4's cost counter: restore's
    * touched-key union re-reads history since the anchor checkpoint
    * (bounded by checkpointEvery); this makes that cost a measured
    * number on the restore probe instead of an assumption. Call BEFORE
    * the restore commits, so the restoring delta itself is not counted. */
  private[graft] def restoreScanBytes(baseDir: String, toVersion: Int): Long = {
    val current = latestVersion(baseDir)
    val cpv = diskCheckpoints(baseDir).filter(_ <= toVersion).max
    dirParquetBytes(checkpointDir(baseDir, cpv)) +
      ((cpv + 1) to current).map(v => dirParquetBytes(deltaDir(baseDir, v))).sum
  }

  def changesRange(
      spark: SparkSession,
      baseDir: String,
      fromVersion: Int,
      toVersion: Int): DataFrame = {
    val vs = versions(baseDir)
    require(fromVersion < toVersion && vs.contains(fromVersion) && vs.contains(toVersion),
      s"DeltaChain.changesRange: need committed fromVersion < toVersion, " +
        s"got $fromVersion, $toVersion of ${vs.mkString("[", ",", "]")}")
    val m = meta(baseDir)
    val cpv = diskCheckpoints(baseDir).filter(_ <= fromVersion).max
    val tableCols = tableColsAt(spark, baseDir, m, toVersion)
    val cp = projectTo(readCheckpoint(spark, baseDir, cpv), m, cpv, toVersion)
      .select(tableCols.map(col) :+ lit("I").as(OpCol): _*)
      .withColumn("_seq", lit(cpv))
    val all = ((cpv + 1) to toVersion).map { v =>
      projectTo(spark.read.parquet(deltaDir(baseDir, v)), m, v, toVersion)
        .select(tableCols.map(col) :+ col(OpCol): _*)
        .withColumn("_seq", lit(v))
    }.foldLeft(cp)(_.unionByName(_))
    // Prune to keys actually touched INSIDE the emission window before
    // the one shuffle (guide §2.3): a key with no record in
    // (fromVersion, toVersion] emits nothing and supplies a preimage to
    // nothing — checkpoint/pre-window rows exist here only to carry
    // preimages for keys that ARE touched. The semi-join keeps every
    // record of every touched key (lag() per key unchanged → output
    // identical, q66b's in-key set-equivalence REQUIRE re-verifies it),
    // while the window sort/shuffle then carries bytes ∝ rows touched
    // in the window, never ∝ table size.
    //
    // CARDINALITY GUARD (VERDICT r17 "what's wrong" #2): the prune
    // itself re-reads every window delta, distincts the keys and
    // semi-joins — worth it when touched ≪ table (the CDC case), pure
    // overhead when the window rewrites most of the table (the r17
    // cdf_range probe: 105k delta rows over a 150k base, range_ms
    // 1,219 → 2,968). Decide from file metadata alone (directory
    // listings, no data read): skip the semi-join when the window's
    // delta bytes are ≥ 1/4 of everything the pass scans anyway
    // (checkpoint + history since it) — past that point the touched-key
    // set approaches table scale and the "degrades to the shuffle we
    // were paying" arm IS the shuffle, minus the prune's own re-read.
    val joined =
      if (rangePruneActive(baseDir, fromVersion, toVersion)) all.join(
        ((fromVersion + 1) to toVersion).map { v =>
          projectTo(spark.read.parquet(deltaDir(baseDir, v)), m, v, toVersion)
            .select(m.keys.map(col): _*)
        }.reduce(_.unionByName(_)).distinct(),
        m.keys, "left_semi")
      else all
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(m.keys.map(col): _*).orderBy(col("_seq"))
    val prevCols = tableCols.map(c => lag(col(c), 1).over(w).as(s"__prev_$c"))
    val withPrev = joined.select(
      (tableCols.map(col) :+ col(OpCol) :+ col("_seq")) ++
        prevCols :+ lag(col(OpCol), 1).over(w).as("__prev_op"): _*)
    val present = col("__prev_op").isNotNull && col("__prev_op") =!= "D"
    def payload(f: String => org.apache.spark.sql.Column) =
      struct(tableCols.map(c => f(c).as(c)): _*)
    val newP = payload(col)
    val oldP = payload(c => col(s"__prev_$c"))
    def change(tag: String, p: org.apache.spark.sql.Column) =
      struct(lit(tag).as("_t"), p.as("_p"))
    // per-row change multiset as a null-compacted array: unmet `when`
    // branches are null structs, filtered away — a delete of an absent
    // key yields the empty array (the no-op), and the array type is
    // inferred, never hand-spelled
    val changesArr = filter(
      array(
        when(col(OpCol) === "U" && !present, change("insert", newP)),
        when(col(OpCol) === "U" && present, change("update_preimage", oldP)),
        when(col(OpCol) === "U" && present, change("update_postimage", newP)),
        when(col(OpCol) === "D" && present, change("delete", oldP))),
      _.isNotNull)
    withPrev
      .where(col("_seq") > fromVersion)
      .select(col("_seq").as("_commit_version"), explode(changesArr).as("_c"))
      .select(tableCols.map(c => col(s"_c._p.$c").as(c)) :+
        col("_c._t").as("_change_type") :+ col("_commit_version"): _*)
  }

  /** Optimistic multi-writer delta commit — the
    * [[VersionedTable.commitNextArbitrated]] claim protocol applied to
    * the delta form: stage the shaped delta ONCE, CAS-claim the
    * version with an atomic create-new marker, winner renames staging
    * → `d{v}` (plus the due checkpoint) and publishes; the loser
    * KEEPS its staged files, awaits the winner's publish, and re-links
    * THE SAME staged delta against the next number — the payload is
    * version-independent, so a retry costs one rename, never a
    * re-write (stage-once, VERDICT r14 item 3). Rebase semantics are
    * last-writer-wins BY KEY (the table's replay contract): when two
    * racing deltas touch the same key, whichever commits LAST owns the
    * final row — serialized, never torn, and exactly what MERGE gives
    * sequential writers; writers needing read-my-state arbitration
    * compute through the snapshot form's `compute`-function protocol
    * instead. Same honest caveats as the snapshot variant (POSIX/HDFS
    * atomicity; orphaned claims fail loudly via the loser's wait
    * deadline). Returns (version, attempts). */
  def commitDeltaArbitrated(
      spark: SparkSession,
      baseDir: String,
      delta: DataFrame,
      deleteCol: Option[String] = None,
      maxAttempts: Int = 5,
      publishWaitMs: Long = 10000L): (Int, Int) = {
    require(latestVersion(baseDir) > 0,
      s"DeltaChain.commitDeltaArbitrated: $baseDir has no v1 — create() first")
    // STAGE ONCE (VERDICT r14 item 3): unlike the snapshot form, whose
    // compute() must re-run against each new head, the delta payload
    // is version-independent — a loser re-LINKS the same staged files
    // on retry instead of re-writing them, so contention costs
    // attempts × (one rename), not attempts × |delta| of write
    // amplification (DeltaArbitrationSpec counts the staged bytes
    // across a forced loss). The events that invalidate staging are a
    // concurrent schema change altering the table's column list or a
    // concurrent constraint add/drop changing what the write boundary
    // must enforce — META IS RE-READ AT THE TOP OF EVERY ATTEMPT
    // (ADVICE r15: a once-read meta let a loser's retry commit a
    // staged delta without enforcing a constraint another writer
    // added concurrently), and either change re-stages (the rare
    // path).
    var attempt = 0
    var stagedCols: Seq[String] = Seq.empty
    var stagedConstraints: Seq[Constraint] = Seq.empty
    var staging: java.nio.file.Path = null
    try {
      while (attempt < maxAttempts) {
        attempt += 1
        val m = meta(baseDir)
        val current = latestVersion(baseDir)
        val lastCp = diskCheckpoints(baseDir).max
        val tableCols = tableColsAt(spark, baseDir, m, current)
        val cons = activeConstraints(m)
        val next = current + 1
        if (staging == null || stagedCols != tableCols ||
            stagedConstraints != cons) {
          if (staging != null) deleteStagingRecursively(staging)
          // stage once, then validate from the staged files (same
          // single-compute order as commitDelta): the delta lineage
          // runs once; the validation aggregate reads back only keys +
          // constraint columns + _op. The finally-block cleans staging
          // when validation throws.
          val shaped = shape(delta, tableCols, deleteCol,
            "DeltaChain.commitDeltaArbitrated")
          staging = Paths.get(baseDir,
            s".stage_d_${java.util.UUID.randomUUID().toString.take(12)}")
          shaped.write.mode("errorifexists").parquet(staging.toString)
          validateStaged(spark, staging.toString, m.keys,
            "DeltaChain.commitDeltaArbitrated", cons)
          stagedCols = tableCols
          stagedConstraints = cons
        }
        val marker = Paths.get(baseDir, s"_commit_v$next")
        val won =
          try { Files.createFile(marker); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        if (won) {
          Files.move(staging, Paths.get(deltaDir(baseDir, next)),
            StandardCopyOption.ATOMIC_MOVE)
          staging = null // moved — nothing left to clean
          if (next - lastCp >= m.checkpointEvery) {
            writeCheckpoint(
              replay(spark, baseDir, lastCp, next, tableCols, m.keys),
              baseDir, next, m.partitionCols)
          }
          VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
          return (next, attempt)
        }
        // lost the claim: KEEP staging, wait for the winner's publish,
        // and retry the same files against the next version number
        val deadline = System.nanoTime() + publishWaitMs * 1000000L
        while (latestVersion(baseDir) < next) {
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"DeltaChain.commitDeltaArbitrated: claim marker $marker exists " +
                s"but v$next was never published within ${publishWaitMs}ms — " +
                "orphaned claim; remove the marker after confirming the writer is gone")
          Thread.sleep(20)
        }
      }
      throw new IllegalStateException(
        s"DeltaChain.commitDeltaArbitrated: lost $maxAttempts consecutive " +
          s"commit races on $baseDir")
    } finally {
      if (staging != null) deleteStagingRecursively(staging)
    }
  }

  private def deleteStagingRecursively(dir: java.nio.file.Path): Unit =
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }

  /** ALTER TABLE ADD COLUMN, metadata-only (the at-scale form of
    * [[VersionedTable.addColumn]], which rewrites the snapshot): the
    * commit writes ONE empty delta file (the version's change record,
    * carrying the widened schema) and one metadata line — zero data
    * rewritten, at any table size. Every row stored before this
    * version backfills AT READ with `defaultSql` evaluated over the
    * row's own columns (so a derived default, e.g.
    * `CAST(qprice DIV 100000 AS BIGINT)`, tracks each row's current
    * values exactly as a rewrite would have). Time travel below the
    * addition returns the narrower schema — the q59 schema-evolution
    * contract, unchanged by the storage form. Later commits MUST
    * carry the column (shapeAndValidate enforces the widened list).
    * Returns the new version. */
  def addColumn(
      spark: SparkSession,
      baseDir: String,
      name: String,
      defaultSql: String): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(current > 0, s"DeltaChain.addColumn: $baseDir has no v1 — create() first")
    require(!name.contains("\t") && !defaultSql.contains("\t") &&
      !name.contains("\n") && !defaultSql.contains("\n"),
      "DeltaChain.addColumn: tabs/newlines are the metadata separators")
    val curCols = tableColsAt(spark, baseDir, m, current)
    require(!curCols.contains(name),
      s"DeltaChain.addColumn: $name already exists in $baseDir")
    val next = current + 1
    // the empty change record: zero rows, widened schema — keeps the
    // replay/changelog invariant that every version v >= 2 has d{v}
    val cp = diskCheckpoints(baseDir).max
    projectTo(readCheckpoint(spark, baseDir, cp), m, cp, current)
      .where(lit(false))
      .withColumn(name, expr(defaultSql))
      .select((curCols :+ name).map(col) :+ lit("U").as(OpCol): _*)
      .coalesce(1)
      .write.mode("errorifexists").parquet(deltaDir(baseDir, next))
    // MANIFEST FIRST, metadata line second (ADVICE r14): the reverse
    // order left a phantom addcol entry bound to an uncommitted
    // version on a crash between the two writes — after orphan-dir
    // cleanup the next ordinary commit reused that version number and
    // the phantom column sprang into existence for every reader. With
    // this ordering a crash between the writes leaves v{next}
    // committed as an empty no-op commit WITHOUT the column (benign:
    // re-running addColumn lands it at the next version); meta()'s
    // committed-version filter is the second line of defense.
    VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
    appendMetaLine(baseDir, s"addcol\t$next\t$name\t$defaultSql")
    next
  }

  /** Does `sql` reference column `name`? Word-boundary text test —
    * conservative (a name inside a string literal also matches), which
    * errs toward refusing a drop/rename, never toward breaking a
    * stored expression. Backtick is deliberately NOT in the boundary
    * classes: a quoted identifier (`name`) must match like a bare one
    * (ADVICE r16 — with backtick in the class, a constraint written
    * as `qbal` > 0 slipped past the fail-closed drop/rename check and
    * left an unresolvable stored expression behind). */
  private def referencesColumn(sql: String, name: String): Boolean =
    ("(?i)(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(name) +
      "(?![A-Za-z0-9_])").r.findFirstIn(sql).isDefined

  /** Shared preconditions for DROP/RENAME COLUMN: the column must not
    * be a key (replay groups by key names across ALL versions), a
    * partition column (the checkpoint layout is keyed to it), a column
    * an ACTIVE CHECK constraint tests (the constraint would silently
    * stop binding — drop the constraint first, loudly), or a column a
    * LIVE added column's read-time default references (the streaming
    * feed re-evaluates those defaults under head names). */
  private def requireDroppable(
      m: Meta, curCols: Seq[String], name: String, who: String): Unit = {
    require(curCols.contains(name),
      s"$who: $name is not a current table column (${curCols.mkString(",")})")
    require(!m.keys.contains(name),
      s"$who: $name is a key column — keys are immutable for the chain's lifetime")
    require(!m.partitionCols.contains(name),
      s"$who: $name is a partition column — the checkpoint layout depends on it")
    activeConstraints(m).foreach { c =>
      require(!referencesColumn(c.sql, name),
        s"$who: active CHECK constraint '${c.name}' (${c.sql}) references " +
          s"$name — drop the constraint first")
    }
    // live added incarnations: the latest add of a currently-present
    // column whose default the read path still evaluates
    m.schemaEvents.collect { case a: AddedColumn => a }
      .groupBy(_.name).values.map(_.maxBy(_.version))
      .filter(a => curCols.contains(a.name) && a.name != name)
      .foreach { a =>
        require(!referencesColumn(a.defaultSql, name),
          s"$who: added column ${a.name}'s read-time default " +
            s"(${a.defaultSql}) references $name — pre-addition rows " +
            "would no longer backfill")
      }
  }

  /** ALTER TABLE DROP COLUMN, metadata-only (the Delta column-mapping
    * contract): one empty change record (carrying the NARROWED schema)
    * plus one metadata line — zero data rewritten at any table size.
    * Old versions keep the old shape (time travel below the drop still
    * returns the column); later commits MUST carry the narrowed list
    * (shapeAndValidate rejects the dropped name by name); a later
    * re-add of the SAME name is a fresh incarnation — pre-drop values
    * never leak into it. Constraints or live read-time defaults that
    * reference the column refuse the drop loudly. Returns the new
    * version. */
  def dropColumn(spark: SparkSession, baseDir: String, name: String): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(current > 0, s"DeltaChain.dropColumn: $baseDir has no v1 — create() first")
    require(!name.contains("\t") && !name.contains("\n"),
      "DeltaChain.dropColumn: tabs/newlines are the metadata separators")
    val curCols = tableColsAt(spark, baseDir, m, current)
    requireDroppable(m, curCols, name, "DeltaChain.dropColumn")
    require(curCols.size > 1,
      s"DeltaChain.dropColumn: $name is the only column of $baseDir")
    val next = current + 1
    writeEmptyChangeRecord(spark, baseDir, m, current,
      curCols.filterNot(_ == name), next)
    // manifest first, metadata line second — addColumn's crash ordering
    VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
    appendMetaLine(baseDir, s"dropcol\t$next\t$name")
    next
  }

  /** ALTER TABLE RENAME COLUMN, metadata-only: one empty change record
    * (carrying the renamed schema) plus one metadata line — values
    * carry over at read, zero data rewritten. Old versions keep the
    * old name; later commits MUST use the new one. Same refusal set as
    * [[dropColumn]] (a rename would silently unbind constraints and
    * read-time defaults that name the column), plus the target name
    * must be free. Returns the new version. */
  def renameColumn(
      spark: SparkSession, baseDir: String, from: String, to: String): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(current > 0, s"DeltaChain.renameColumn: $baseDir has no v1 — create() first")
    require(Seq(from, to).forall(n => !n.contains("\t") && !n.contains("\n")),
      "DeltaChain.renameColumn: tabs/newlines are the metadata separators")
    require(from != to, "DeltaChain.renameColumn: from and to are the same name")
    val curCols = tableColsAt(spark, baseDir, m, current)
    requireDroppable(m, curCols, from, "DeltaChain.renameColumn")
    require(!curCols.contains(to),
      s"DeltaChain.renameColumn: $to already exists in $baseDir")
    val next = current + 1
    writeEmptyChangeRecord(spark, baseDir, m, current,
      curCols.map(c => if (c == from) to else c), next,
      _.withColumnRenamed(from, to))
    VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
    appendMetaLine(baseDir, s"renamecol\t$next\t$from\t$to")
    next
  }

  /** ALTER TABLE ADD CONSTRAINT (CHECK), metadata-only: commits one
    * empty change record + one metadata line; every LATER commit's
    * upsert rows must satisfy `sql` — validated inside the write
    * boundary's single aggregate pass, failing loudly BY NAME with
    * nothing committed (the Delta Lake contract: existing rows are not
    * re-validated, so the add costs metadata at any table size; pass
    * `validateExisting = true` to additionally pay one scan proving
    * the current state satisfies it before the constraint lands).
    * Same manifest-first crash ordering as [[addColumn]]. Returns the
    * new version. */
  def addConstraint(
      spark: SparkSession,
      baseDir: String,
      name: String,
      sql: String,
      validateExisting: Boolean = false): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(current > 0,
      s"DeltaChain.addConstraint: $baseDir has no v1 — create() first")
    require(!name.contains("\t") && !sql.contains("\t") &&
      !name.contains("\n") && !sql.contains("\n"),
      "DeltaChain.addConstraint: tabs/newlines are the metadata separators")
    require(!activeConstraints(m).exists(_.name == name),
      s"DeltaChain.addConstraint: '$name' is already active on $baseDir")
    // the predicate must RESOLVE against the current schema — catch a
    // mis-spelled column at ADD time, not at the next writer's commit
    // (analysis only; no job runs unless validateExisting)
    try readAsOf(spark, baseDir, current).where(expr(sql))
      .queryExecution.analyzed
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"DeltaChain.addConstraint: '$name' ($sql) does not resolve " +
            s"against the table's columns: ${e.getMessage}")
    }
    if (validateExisting) {
      val bad = readAsOf(spark, baseDir, current)
        .where(expr(sql) <=> lit(false)).count()
      require(bad == 0,
        s"DeltaChain.addConstraint: $bad existing row(s) violate '$name' " +
          s"($sql) — constraint not added")
    }
    val next = current + 1
    val tableCols = tableColsAt(spark, baseDir, m, current)
    writeEmptyChangeRecord(spark, baseDir, m, current, tableCols, next)
    VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
    appendMetaLine(baseDir, s"constraint\t$next\t$name\t$sql")
    next
  }

  /** ALTER TABLE DROP CONSTRAINT — metadata-only, same shape as
    * [[addConstraint]]; later commits stop enforcing `name` (the name
    * may be re-added later with a different predicate). */
  def dropConstraint(
      spark: SparkSession,
      baseDir: String,
      name: String): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(current > 0,
      s"DeltaChain.dropConstraint: $baseDir has no v1 — create() first")
    require(activeConstraints(m).exists(_.name == name),
      s"DeltaChain.dropConstraint: no active constraint '$name' on $baseDir")
    val next = current + 1
    val tableCols = tableColsAt(spark, baseDir, m, current)
    writeEmptyChangeRecord(spark, baseDir, m, current, tableCols, next)
    VersionedTable.publishManifest(baseDir, versions(baseDir) :+ next)
    appendMetaLine(baseDir, s"dropconstraint\t$next\t$name")
    next
  }

  /** The stored change feed as a STRUCTURED STREAM — the read side
    * that closes t28's loop (VERDICT r14 item 7): t28 streams deltas
    * IN; this streams the changelog OUT, so ingest → CDF →
    * replica/incremental-MV runs as one continuous pipeline. A file
    * stream over the `d*` delta dirs (checkpoints and metadata never
    * match the glob), each row tagged `_commit_version` recovered from
    * its file path and `_change_type` ∈ {upsert, delete} — the
    * [[changelog]] vocabulary, streaming. Rows at-or-below
    * `fromVersion` are filtered out (the consumer's resume point).
    *
    * Ordering contract (hardened, VERDICT r15 item 3): successive
    * commits create their delta files strictly in commit order (d{v+1}
    * only begins after v's publish), and each micro-batch takes EVERY
    * new file the listing found — so a batch can carry several commits
    * and a consumer replays them sorted by `_commit_version` (t29).
    * The old per-file trigger delivered files in (mtime, path) order,
    * where `d10 < d9` LEXICOGRAPHICALLY — two commits landing in the
    * same mtime granule arrived out of order; whole-listing batches
    * cannot split that pair. A consumer that must not reorder should
    * still assert monotone versions across batches — a listing racing
    * an in-flight commit can, rarely, defer one version to the next
    * batch (fail loudly, never silently re-order). Schema changes: the
    * stream carries the schema fixed AT START (as-of the head version
    * when called) — files stored before a rename/drop/add project
    * per-row to the head shape via their own `_commit_version` (the
    * batch readers' file-level projection can't fire here: a wide
    * declared schema NULL-surfaces missing columns instead of omitting
    * them); a consumer outliving a later schema change restarts with
    * the new shape (the standard streaming-source stance). */
  def readChangeFeedStream(
      spark: SparkSession,
      baseDir: String,
      fromVersion: Int): DataFrame = {
    val m = meta(baseDir)
    val head = latestVersion(baseDir)
    require(head > 0, s"DeltaChain.readChangeFeedStream: $baseDir has no v1")
    val tableCols = tableColsAt(spark, baseDir, m, head)
    val eventsDesc = m.schemaEvents.filter(_.version <= head).sortBy(-_.version)
    // Types of the CURRENT physical columns — from the newest stored
    // delta when one exists (it carries every current column + _op); a
    // freshly created chain has only c1 on disk (ADVICE r15: the old
    // head-delta read crashed here), so fall back to the checkpoint
    // sidecar plus a string _op.
    val headFields: Map[String, org.apache.spark.sql.types.DataType] = {
      val dd = diskDeltas(baseDir)
      if (dd.nonEmpty)
        spark.read.parquet(deltaDir(baseDir, dd.max)).schema
          .map(f => f.name -> f.dataType).toMap
      else
        checkpointSchema(spark, baseDir, diskCheckpoints(baseDir).max)
          .map(f => f.name -> f.dataType).toMap +
          (OpCol -> org.apache.spark.sql.types.StringType)
    }
    // Per head column: its PHYSICAL-NAME TIMELINE — (fromVersion,
    // storedName) segments, newest first — plus (birthVersion,
    // defaultSql) when the incarnation was born by an ADD. Walking the
    // event log newest-first: a rename TO the current name opens a new
    // segment and redirects the walk to the old name; an add OF the
    // current name is the incarnation's birth — rows below it backfill
    // the default, INCLUDING rows that physically carry a pre-drop
    // column of the same name (destroyed values must never leak).
    def timeline(c: String): (Seq[(Int, String)], Option[(Int, String)]) = {
      var segs = List.empty[(Int, String)]
      var name = c
      var birth = Option.empty[(Int, String)]
      eventsDesc.foreach { e =>
        if (birth.isEmpty) e match {
          case RenamedColumn(v, f, t) if t == name =>
            segs :+= (v -> name); name = f
          case AddedColumn(v, n, d) if n == name =>
            birth = Some(v -> d)
          case _ => ()
        }
      }
      segs :+= (birth.map(_._1).getOrElse(1) -> name)
      (segs, birth)
    }
    val lines = tableCols.map(c => c -> timeline(c)).toMap
    // Declared read schema: every physical name any segment uses (old
    // files carry old names; the reader NULL-fills whichever a given
    // file lacks), each typed by the head column its segment feeds.
    val physNames =
      (tableCols.flatMap(c => lines(c)._1.map(_._2)) :+ OpCol).distinct
    val schema = org.apache.spark.sql.types.StructType(
      physNames.map { n =>
        // ALL head columns whose timeline stores under this physical
        // name must agree on the type: original `a` renamed away plus
        // a fresh `a` added with a DIFFERENT type would otherwise read
        // old files under whichever incarnation matched first —
        // parquet read errors or silently corrupt values (ADVICE r16).
        // Schema evolution does not support type changes; refuse loudly.
        val owners = tableCols.filter(c => lines(c)._1.exists(_._2 == n))
        val types = owners.map(headFields).distinct
        require(types.size <= 1,
          s"DeltaChain.readChangeFeedStream: physical column '$n' is " +
            s"stored by incarnations with conflicting types " +
            s"(${owners.mkString(",")}: ${types.mkString(" vs ")}) — " +
            "schema evolution does not support type changes, so old " +
            "files cannot be read under one declared type")
        org.apache.spark.sql.types.StructField(
          n, types.headOption.getOrElse(headFields(n)))
      })
    val raw = spark.readStream
      .schema(schema)
      .parquet(s"$baseDir/d*")
    // version from the LAST /d<digits>/ path segment (the file's own
    // parent dir) — an unanchored extract took the FIRST match, so a
    // baseDir containing '/d7/' stamped every row 7 (ADVICE r15)
    val ver = regexp_extract(
      col("_metadata.file_path"), "/d(\\d+)/[^/]*$", 1).cast("int")
    val withVer = raw.withColumn("_commit_version", ver)
    // pass 1: segment-resolve each head column's RAW value per row —
    // which physical name held it at the row's commit version (null
    // below the incarnation's birth)
    val segResolved = tableCols.foldLeft(withVer) { (d, c) =>
      val raw0 = lines(c)._1.foldRight(
        lit(null).cast(headFields(c)): org.apache.spark.sql.Column) {
        case ((from, nm), acc) =>
          when(col("_commit_version") >= from, col(nm)).otherwise(acc)
      }
      d.withColumn(s"__cfs_$c", raw0)
    }
    val logical = segResolved.select(
      tableCols.map(c => col(s"__cfs_$c").as(c)) :+
        col(OpCol) :+ col("_commit_version"): _*)
    // pass 2, ascending birth order: pre-birth rows evaluate the
    // read-time default over LOGICAL columns — pass 1 already
    // version-resolved those, and rename/drop of a column a live
    // default references is refused at write time, so add-time names
    // ARE head names here
    val backfilled = tableCols
      .flatMap(c => lines(c)._2.map { case (bv, dflt) => (bv, c, dflt) })
      .sortBy(_._1)
      .foldLeft(logical) { case (df, (bv, c, dflt)) =>
        df.withColumn(c,
          when(col("_commit_version") < bv, expr(dflt)).otherwise(col(c)))
      }
    backfilled
      .where(col("_commit_version") > fromVersion)
      .withColumn("_change_type",
        when(col(OpCol) === "D", lit("delete")).otherwise(lit("upsert")))
      .drop(OpCol)
  }

  /** Log retention (the delta form's VACUUM): drop every version
    * strictly below `keepFrom` — manifest first (atomically, so a
    * reader never resolves a version whose files are mid-delete),
    * then the physical delta/checkpoint dirs. `keepFrom` must carry a
    * checkpoint (or one must exist at-or-below it that SURVIVES):
    * every retained version's replay path needs a checkpoint at or
    * below it, so the boundary rule is: the newest checkpoint
    * at-or-below `keepFrom` is retained even if its version number
    * falls below the cut — exactly Delta's "checkpoint retention
    * follows log retention" coupling, made explicit. Returns the
    * retained versions. Time travel below the cut fails loudly in
    * [[readAsOf]]'s committed-versions check; [[changesAt]]/
    * [[changelog]] windows reaching below it fail the same way.
    *
    * Staging janitor (VERDICT r15 item 5): truncate also sweeps
    * `.stage_d_*` dirs older than `staleStagingMs` — a writer killed
    * `-9` mid-arbitration leaks its staged delta forever otherwise
    * (the `finally` cleanup only covers JVM-visible exits). The age
    * gate keeps a LIVE writer's staging safe: its dir is at most one
    * commit old. */
  def truncate(
      baseDir: String,
      keepFrom: Int,
      staleStagingMs: Long = 6L * 3600 * 1000): Seq[Int] = {
    val vs = versions(baseDir)
    require(vs.contains(keepFrom),
      s"DeltaChain.truncate: keepFrom $keepFrom not a committed version of $baseDir")
    val anchor = diskCheckpoints(baseDir).filter(_ <= keepFrom)
    require(anchor.nonEmpty,
      s"DeltaChain.truncate: no checkpoint at or below $keepFrom — " +
        "readAsOf(keepFrom) would have no replay base; checkpoint first")
    val anchorCp = anchor.max
    val keep = vs.filter(_ >= keepFrom)
    VersionedTable.publishManifest(baseDir, keep)
    // Physical reclamation follows REPLAY reachability, not manifest
    // membership (the same rule [[VersionedTable.expire]] applies to
    // DV base snapshots): every retained version replays from the
    // anchor checkpoint plus the deltas ABOVE it, so
    //   - checkpoints below the anchor die,
    //   - deltas at-or-below the anchor die (replay starts AT the
    //     anchor; the anchor's own change record goes with the cut —
    //     changelog windows below keepFrom are gone by contract),
    //   - deltas in (anchor, keepFrom) SURVIVE as unmanifested replay
    //     fuel when the anchor sits below the cut — invisible to time
    //     travel, reclaimed by a later truncate once a newer
    //     checkpoint becomes the anchor.
    def rm(d: String): Unit = {
      val p = Paths.get(d)
      if (Files.exists(p)) deleteStagingRecursively(p)
    }
    diskCheckpoints(baseDir).filter(_ < anchorCp)
      .foreach(v => rm(checkpointDir(baseDir, v)))
    diskDeltas(baseDir).filter(_ <= anchorCp)
      .foreach(v => rm(deltaDir(baseDir, v)))
    // orphaned-staging sweep: only dirs past the age gate die
    val cutoff = System.currentTimeMillis() - staleStagingMs
    Option(new java.io.File(baseDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith(".stage_d_") &&
        f.lastModified() < cutoff)
      .foreach(f => rm(f.getAbsolutePath))
    keep
  }

  /** Checkpoint/delta versions present ON DISK — the replay layer's
    * view. After [[truncate]] the anchor checkpoint (and the deltas
    * above it up to the cut) can legitimately outlive their manifest
    * entries, so replay resolution scans dirs, never the manifest. */
  private def diskCheckpoints(baseDir: String): Seq[Int] =
    listNumbered(baseDir, "c")
  private def diskDeltas(baseDir: String): Seq[Int] =
    listNumbered(baseDir, "d")
  private def listNumbered(baseDir: String, prefix: String): Seq[Int] =
    Option(new java.io.File(baseDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.matches(s"$prefix\\d+"))
      .map(_.getName.drop(1).toInt).toSeq.sorted

  /** DESCRIBE HISTORY for the delta form: one row per committed
    * version — number, OPERATION KIND (create / delta / add_column /
    * drop_column / rename_column / add_constraint / drop_constraint /
    * optimize / restore), the change rows it carried, and whether a
    * checkpoint landed. Kinds come from the commits' OWN metadata:
    * v1 is create, schema/constraint versions from their event lines,
    * optimize/restore from the `kind` line their commit records
    * (ADVICE r15: inferring "optimize" from the empty-delta+checkpoint
    * artifact shape mislabeled a legitimate zero-row data delta that
    * landed on the checkpoint cadence); everything else is a data
    * delta, except a manifest version whose change record a truncate
    * reclaimed (checkpoint_anchor). Row counts come from ONE multi-dir
    * scan grouped by the path-extracted version — O(1) Spark jobs for
    * any chain length (ADVICE r15: the per-version count() loop paid
    * 10k job launches for a 10k-commit audit view); bytes are
    * directory listings. At 100 TB this is a manifest walk plus one
    * column-pruned scan of the (delta-sized) change records, never a
    * table scan. */
  def history(spark: SparkSession, baseDir: String): DataFrame = {
    import spark.implicits._
    val m = meta(baseDir)
    val metaKind: Map[Int, String] =
      m.schemaEvents.map {
        case a: AddedColumn   => a.version -> "add_column"
        case d: DroppedColumn => d.version -> "drop_column"
        case r: RenamedColumn => r.version -> "rename_column"
      }.toMap ++
        m.constraints.map(_.version -> "add_constraint").toMap ++
        m.constraintDrops.map { case (v, _) => v -> "drop_constraint" }.toMap ++
        m.kinds
    // recursive: a partitioned checkpoint keeps its parquet one level
    // down inside the partition dirs
    def dirBytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(dir))
    }
    val vs = versions(baseDir)
    val withDelta =
      vs.filter(v => Files.exists(Paths.get(deltaDir(baseDir, v))))
    // one job counts every version's change rows: read all delta dirs,
    // group by the file's own /d<version>/ segment; data columns are
    // pruned away, so schema drift across rename/drop boundaries never
    // touches the scan
    val counts: Map[Int, Long] =
      if (withDelta.isEmpty) Map.empty
      else spark.read.parquet(withDelta.map(deltaDir(baseDir, _)): _*)
        .select(regexp_extract(
          col("_metadata.file_path"), "/d(\\d+)/[^/]*$", 1)
          .cast("int").as("__v"))
        .groupBy("__v").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    vs.map { v =>
      val hasDelta = Files.exists(Paths.get(deltaDir(baseDir, v)))
      val hasCp = hasCheckpoint(baseDir, v)
      val kind =
        if (v == 1) "create"
        else metaKind.getOrElse(v,
          // a manifest version whose change record a truncate
          // reclaimed: only its checkpoint anchor survives
          if (!hasDelta && hasCp) "checkpoint_anchor" else "delta")
      (v, kind, counts.getOrElse(v, 0L), hasCp,
        dirBytes(deltaDir(baseDir, v)), dirBytes(checkpointDir(baseDir, v)))
    }.toDF("version", "kind", "delta_rows", "checkpointed",
      "delta_bytes", "checkpoint_bytes")
  }

  /** RESTORE TABLE t TO VERSION — rollback as a FORWARD commit
    * (VERDICT r15 item 2): the state at `toVersion` becomes the new
    * head by committing the DIFF between head and target as an
    * ordinary delta, so history is PRESERVED (every version including
    * the bad ones still time-travels), the changelog carries the
    * restoring rows, and downstream incremental MVs (q66b/t30) keep
    * folding straight through the restore. The delta is minimal —
    * upserts for keys whose target row differs from (or is missing
    * at) head, deletes for head keys the target lacks — so the commit
    * costs ∝ |rows the rollback touches|, never table size. Data is
    * restored UNDER THE CURRENT SCHEMA (the target state projects
    * forward through any add/drop/rename between the two versions);
    * constraints active at head validate the restoring rows like any
    * other write — a restore that would violate one fails loudly with
    * nothing committed. The commit records kind `restore` for the
    * audit view (written after the publish, the addColumn crash
    * ordering: a crash between the two leaves a correct restore
    * commit labeled `delta` — an audit-label blemish, never a data
    * defect). Returns the new version. */
  def restore(spark: SparkSession, baseDir: String, toVersion: Int): Int = {
    val m = meta(baseDir)
    val current = latestVersion(baseDir)
    require(versions(baseDir).contains(toVersion) && toVersion < current,
      s"DeltaChain.restore: need a committed toVersion below the head " +
        s"($current), got $toVersion of ${versions(baseDir).mkString("[", ",", "]")}")
    val tableCols = tableColsAt(spark, baseDir, m, current)
    // Changelog inversion (guide §2.3 "shuffle fewer bytes"; VERDICT
    // r16's filed asymptotic soft spot): the restoring delta depends
    // ONLY on keys touched in (toVersion, current] — an untouched key
    // is identical in both states by definition. The old form computed
    // two full readAsOf states and diffed them with exceptAll + an
    // anti-join: ~five table-scale shuffles (exceptAll hashes FULL
    // rows of both states) to find a diff that is usually tiny. Here
    // ONE pass over the same artifacts (anchor checkpoint + deltas —
    // exactly what the two readAsOf calls already required, so no new
    // fallback window is needed) is semi-join-pruned to touched keys
    // BEFORE its only shuffle, then a single per-key aggregate
    // recovers both endpoint states: the latest record at-or-below
    // toVersion is the key's state at toVersion (absent when none or
    // deleted), the latest record overall is its state at head. Rows
    // emitted are EXACTLY the old form's: upsert the toVersion row
    // where it differs from (or is missing at) head; delete head keys
    // the target lacks. Shuffled bytes ∝ rows touched since
    // toVersion, never table size; the checkpoint is scanned (not
    // shuffled) once.
    val cpv = diskCheckpoints(baseDir).filter(_ <= toVersion).max
    val pay = struct(tableCols.map(col): _*)
    val cp = projectTo(readCheckpoint(spark, baseDir, cpv), m, cpv, current)
      .select(tableCols.map(col) :+ lit("I").as(OpCol): _*)
      .withColumn("_seq", lit(cpv))
    val all = ((cpv + 1) to current).map { v =>
      projectTo(spark.read.parquet(deltaDir(baseDir, v)), m, v, current)
        .select(tableCols.map(col) :+ col(OpCol): _*)
        .withColumn("_seq", lit(v))
    }.foldLeft(cp)(_.unionByName(_))
    val touched = ((toVersion + 1) to current).map { v =>
      projectTo(spark.read.parquet(deltaDir(baseDir, v)), m, v, current)
        .select(m.keys.map(col): _*)
    }.reduce(_.unionByName(_)).distinct()
    val grouped = all.join(touched, m.keys, "left_semi")
      .groupBy(m.keys.map(col): _*)
      .agg(
        max_by(struct(col(OpCol).as("op"), pay.as("p")),
          when(col("_seq") <= toVersion, col("_seq"))).as("o"),
        max_by(struct(col(OpCol).as("op"), pay.as("p")),
          col("_seq")).as("h"))
    val oldPresent = col("o").isNotNull && col("o.op") =!= "D"
    val newPresent = col("h").isNotNull && col("h.op") =!= "D"
    val del = "__graft_restore_del"
    val ups = grouped
      .where(oldPresent && (!newPresent || !(col("o.p") <=> col("h.p"))))
      .select(col("o.p.*")).withColumn(del, lit(false))
    val dels = grouped
      .where(!oldPresent && newPresent)
      .select(col("h.p.*")).withColumn(del, lit(true))
    val v = commitDelta(spark, baseDir, ups.unionByName(dels), Some(del))
    appendMetaLine(baseDir, s"kind\t$v\trestore")
    v
  }

  /** Per-commit storage census: version, kind, file count, bytes for
    * the delta and (when present) checkpoint dirs — the evidence that
    * commit cost tracks the delta, not the table (directory listings
    * only; no data read). */
  def commitBytes(spark: SparkSession, baseDir: String): DataFrame = {
    import spark.implicits._
    def dirBytes(dir: String): (Int, Long) = {
      val d = new java.io.File(dir)
      val fs = Option(d.listFiles())
        .map(_.filter(f => f.isFile && f.getName.endsWith(".parquet")))
        .getOrElse(Array.empty[java.io.File])
      (fs.length, fs.map(_.length()).sum)
    }
    versions(baseDir).map { v =>
      val (df, db) = dirBytes(deltaDir(baseDir, v))
      val (cf, cb) = dirBytes(checkpointDir(baseDir, v))
      (v, df, db, cf, cb)
    }.toDF("version", "delta_files", "delta_bytes",
      "checkpoint_files", "checkpoint_bytes")
  }
}
