package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE-style upsert as a composition of built-in operators: the result
  * contains every key from base ∪ updates, with the updates row winning
  * where both exist. This is the maintenance primitive behind "refresh a
  * curated training set with a corrected batch" — whole-row semantics of
  * `MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`
  * expressed as one full-outer join plus coalesce, so it needs no table
  * format extension and Catalyst plans it like any other join.
  *
  * Scale posture: a single shuffle of both sides on the key. When base is
  * bucketed on the key (operators/Bucketing.scala), its shuffle drops out
  * and the merge is a co-located join — the incremental-maintenance shape
  * you want at 100 TB: cost ∝ updates + touched buckets, not base size.
  * Requires each key to appear at most once per side (standard MERGE
  * precondition); enforce upstream or dedup first.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); pipeline-ops
  * family, SURVEY.md §2.10.
  */
object Upsert {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"updates schema ${updates.columns.mkString(",")} != base schema ${cols.mkString(",")}")
    require(keys.nonEmpty && keys.forall(cols.contains), s"bad keys $keys")
    val b = base.select(cols.map(c => col(c).as(s"_b_$c")): _*)
    val u = updates.select(cols.map(c => col(c).as(s"_u_$c")) :+
      lit(true).as("_u_present"): _*)
    val cond = keys.map(k => col(s"_b_$k") === col(s"_u_$k")).reduce(_ && _)
    // key columns coalesce on the key; payload columns take the update
    // side whenever the row CAME from the update side. A literal presence
    // marker (not key null-ness) decides that, so an update row whose key
    // column is NULL — which never equi-matches and survives the full
    // outer join unpaired — still carries its own payload through instead
    // of reading all-NULL base columns.
    val matched = col("_u_present").isNotNull
    b.join(u, cond, "full_outer")
      .select(cols.map { c =>
        if (keys.contains(c)) coalesce(col(s"_u_$c"), col(s"_b_$c")).as(c)
        else when(matched, col(s"_u_$c")).otherwise(col(s"_b_$c")).as(c)
      }: _*)
  }

  /** Apply a CDC changelog: keep, per key, the payload of the
    * highest-`seqCol` change whose `opCol` is not `"D"` — i.e. replay
    * INSERT/UPDATE/DELETE in sequence order and materialize the final
    * table. ONE hash aggregate keyed by the primary key (the same
    * shuffle a MERGE would pay, minus the per-partition SORT the old
    * row_number window form also paid): `max_by` over the (seq, op)
    * struct picks the same winning record lexicographically, and hash
    * aggregation partial-aggregates map-side and never sorts — the
    * replay path under every DeltaChain readAsOf rides this. Cost ∝
    * changelog size, never the history: the standard compaction step
    * for ingesting a Debezium-style feed. Ties on (key, seq) break by
    * the later op ('U' > 'I' > 'D' is NOT assumed — pass unique seqs
    * per key; the tiebreak only pins determinism). */
  def applyCdc(
      changes: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: String): DataFrame = {
    val all = changes.columns.toSeq
    changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(all.map(col): _*),
        struct(col(seqCol), col(opCol))).as("_w"))
      .select(col("_w.*"))
      .where(col(opCol) =!= "D")
      .drop(seqCol, opCol)
  }
}
