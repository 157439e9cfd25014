package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL-surface time travel for [[graft.operators.DeltaChain]] tables
  * (VERDICT r15 item 7): an analyzer resolution rule that binds the
  * two-part identifier `graft_chain`.`<baseDir>` to the chain's
  * replayed state, so SQL-only consumers read versioned tables with
  * plain SQL — including Spark's own temporal clause:
  *
  * {{{
  *   SELECT * FROM graft_chain.`/data/tbl`                  -- head
  *   SELECT * FROM graft_chain.`/data/tbl` VERSION AS OF 3  -- travel
  *   SELECT * FROM graft_chain.`/data/tbl@3`                -- suffix form
  * }}}
  *
  * The substituted plan IS [[graft.operators.DeltaChain.readAsOf]]'s
  * analyzed plan — parquet scans plus the replay fold — so every
  * Catalyst optimization the library read path gets (filter pushdown,
  * column pruning, PARTITION PRUNING on partitioned checkpoints)
  * applies unchanged to the SQL surface; q76 plan-asserts the
  * partition filter exactly like q71 does for the library call. A
  * resolution rule beats a DataSource V2 shim here: DSv2 would force
  * the replay into a custom reader and forfeit the native parquet
  * scan paths. Write access stays with the library's arbitrated
  * commits (read-only by construction — the rule only ever SUBSTITUTES
  * a relation).
  *
  * Registered by [[GraftExtensions]]; TIMESTAMP AS OF is refused
  * loudly (versions are the chain's travel axis).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); public
  * contract shape: Delta Lake's `delta.`path`` + VERSION AS OF SQL
  * surface, re-expressed as a Catalyst rule.
  */
case class GraftChainRelation(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def chainSpec(parts: Seq[String]): Option[String] =
    if (parts.length == 2 && parts.head.equalsIgnoreCase("graft_chain"))
      Some(parts(1))
    else None

  private def resolve(raw: String, version: Option[Int]): LogicalPlan = {
    // `path@N` is the suffix form; an explicit VERSION AS OF wins
    val (path, suffixV) = raw.lastIndexOf('@') match {
      case i if i > 0 && raw.length > i + 1 && raw.drop(i + 1).forall(_.isDigit) =>
        (raw.take(i), Some(raw.drop(i + 1).toInt))
      case _ => (raw, None)
    }
    require(graft.operators.DeltaChain.versions(path).nonEmpty,
      s"graft_chain: no delta chain at '$path' (no committed manifest)")
    val v = version.orElse(suffixV)
      .getOrElse(graft.operators.DeltaChain.latestVersion(path))
    graft.operators.DeltaChain.readAsOf(session, path, v)
      .queryExecution.analyzed
  }

  private def parseVersion(s: String): Int =
    try s.toInt
    catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft_chain: VERSION AS OF takes an integer version, got '$s'")
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if chainSpec(u.multipartIdentifier).isDefined =>
        require(ts.isEmpty,
          "graft_chain: TIMESTAMP AS OF is not supported — versions are " +
            "the chain's travel axis (use VERSION AS OF)")
        resolve(chainSpec(u.multipartIdentifier).get, ver.map(parseVersion))
      case u: UnresolvedRelation
          if chainSpec(u.multipartIdentifier).isDefined =>
        resolve(chainSpec(u.multipartIdentifier).get, None)
    }
}
