package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO as one library operator — the lakehouse upsert a real
  * pipeline reaches for weekly (VERDICT r11 "What's missing" #2). The
  * repo had the pieces (t17/t18 foreachBatch merge, lp26 CDC apply,
  * q33 SCD2) but no single op with the matched/not-matched/delete
  * contract:
  *
  *   MERGE INTO target USING source ON target.keys = source.keys
  *     WHEN MATCHED AND source.<deleteCol>  THEN DELETE
  *     WHEN MATCHED                         THEN UPDATE SET * (source row wins)
  *     WHEN NOT MATCHED                     THEN INSERT *
  *
  * Returns the post-merge table (same schema as `target`). This is the
  * SNAPSHOT form — it produces the new table rather than mutating
  * files in place, which is also how Delta/Iceberg execute MERGE
  * underneath (rewrite the touched files from a join).
  *
  * Plan shape (the 100 TB contract): ONE full-outer equi-join on the
  * merge keys — each side shuffles once by key and AQE handles skew;
  * classification and column coalescing are per-row projections on top.
  * Spark cannot broadcast a full outer join, so this is the plan a
  * cluster would pick at any scale; no second pass over either input
  * (an anti-join + union formulation reads the source twice).
  *
  * Preconditions (standard SQL MERGE): `keys` are non-null and UNIQUE
  * in `source`. ANSI MERGE rejects duplicate source keys at runtime;
  * THIS operator by default does NOT — a matched target row silently
  * fans out into one output row per duplicate source row (a join, not
  * an error). Pass `validateUniqueKeys = true` to get the ANSI
  * behavior: one extra count-vs-distinct aggregate over `source`
  * (a single shuffle on the merge keys, same keys the join shuffles
  * on) that throws IllegalArgumentException naming the duplicate
  * count before any output is produced. `source` must carry every
  * `target` column (extra columns, e.g. the delete flag, are dropped
  * from the output). The delete condition applies to MATCHED rows
  * only; BY DEFAULT a not-matched source row flagged for delete
  * inserts, exactly as `WHEN NOT MATCHED THEN INSERT` says. That ANSI
  * reading diverges from CDC-apply semantics, where a delete of an
  * absent key is a no-op ([[Upsert.applyCdc]], and therefore
  * [[DeltaChain]] replay): under at-least-once redelivery a re-sent
  * delete of an already-deleted key would RESURRECT the row (ADVICE
  * r14). Writers applying a CDC feed pass
  * `insertUnmatchedDeletes = false` — the equivalent of conditioning
  * the insert clause with `AND NOT source.del`, which is how the same
  * pipeline is written in SQL MERGE — and the snapshot and delta
  * storage forms then agree state-for-state on ANY delta, deletes of
  * absent keys included (DeleteAbsentSemanticsSpec pins both
  * readings).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.11 (pipeline/curation ops).
  */
object MergeUpsert {

  def mergeUpsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      deleteCol: Option[String] = None,
      validateUniqueKeys: Boolean = false,
      insertUnmatchedDeletes: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "mergeUpsert: at least one merge key")
    val dataCols = target.columns.toSeq
    require(keys.forall(dataCols.contains),
      s"mergeUpsert: keys ${keys.mkString(",")} must be target columns")
    require(dataCols.forall(source.columns.contains),
      "mergeUpsert: source must carry every target column")
    if (validateUniqueKeys) {
      // ANSI MERGE's duplicate-source-key rejection, opt-in: one
      // aggregate over source (shuffles on the same merge keys the join
      // will) comparing total rows vs distinct key tuples.
      val Array(total, distinct) = source
        .agg(count(lit(1)), countDistinct(keys.head, keys.tail: _*))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      require(total == distinct,
        s"mergeUpsert: source has ${total - distinct} duplicate merge-key " +
          s"row(s) on (${keys.mkString(",")}) — ANSI MERGE rejects this; " +
          "dedup the source or drop validateUniqueKeys to accept fan-out")
    }
    // Rename the source side up front: after a self-shaped join both
    // sides expose identical column names and resolution turns on
    // fragile alias scoping; explicit __s_ prefixes make every
    // downstream reference unambiguous.
    val sCols: Seq[Column] =
      dataCols.map(c => col(c).as(s"__s_$c")) ++
        deleteCol.map(c => col(c).as("__s_del")).toSeq
    val s2 = source.select(sCols: _*).withColumn("__s", lit(true))
    val t2 = target.withColumn("__t", lit(true))
    val on = keys.map(k => t2(k) === s2(s"__s_$k")).reduce(_ && _)
    val joined = t2.join(s2, on, "full_outer")
    val matched = col("__t").isNotNull && col("__s").isNotNull
    // ANSI: only matched rows can delete (unmatched delete-flagged rows
    // insert); CDC (insertUnmatchedDeletes = false): a delete-flagged
    // source row never survives, matched or not — delete-of-absent is
    // a no-op, aligning with DeltaChain replay.
    val deleted = deleteCol
      .map { _ =>
        val flagged = coalesce(col("__s_del"), lit(false))
        if (insertUnmatchedDeletes) matched && flagged else flagged
      }
      .getOrElse(lit(false))
    joined
      .where(!deleted)
      .select(dataCols.map(c =>
        when(col("__s").isNotNull, col(s"__s_$c")).otherwise(col(c)).as(c)): _*)
  }
}
