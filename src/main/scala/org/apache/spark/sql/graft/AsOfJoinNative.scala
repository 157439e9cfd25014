package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.functions.col

/** Native backward as-of join: custom LogicalPlan + SparkStrategy +
  * physical merge-scan operator (the (c)-tier of SURVEY.md §4.2's
  * custom-operator ladder), registered through [[GraftExtensions]].
  *
  * Semantics match DuckDB's `ASOF LEFT JOIN` (the J8 oracle): for every
  * left row, attach the single latest right row with equal keys and
  * right-time <= left-time; null payload when none precedes.
  *
  * Physical shape: EnsureRequirements gives each side ONE hash exchange
  * on the join keys plus a per-partition sort by (keys, time) — then
  * [[AsOfJoinExec]] merge-scans the two sorted streams in O(|L| + |R|)
  * per partition with O(1) state (one buffered match), never
  * materialising a pair set or a window buffer. Same shuffle count as
  * the union+window route (`graft.operators.AsOfJoin`) but no
  * whole-partition window sort of the UNION — each side sorts
  * independently, spilling through the regular sorter, and the
  * merge itself is streaming. Skewed keys degrade to a linear scan of
  * that key's rows, not a window buffer.
  *
  * Implementation note: `output` is COMPUTED from the children (not a
  * constructor argument) because analyzer/optimizer rules such as
  * UpdateAttributeNullability rewrite every Expression held in
  * constructor args — a stored output Seq would have its forced
  * nullability silently reverted, and the no-match null row would then
  * be read through non-nullable BoundReferences as zeros.
  */
object AsOfJoinNative {

  private def outputOf(
      leftOut: Seq[Attribute],
      rightOut: Seq[Attribute],
      rightKeys: Seq[Expression],
      prefix: String): Seq[Attribute] = {
    val keyIds = rightKeys.flatMap(_.references.map(_.exprId)).toSet
    leftOut ++ rightOut.filterNot(a => keyIds.contains(a.exprId)).map(a =>
      a.withNullability(true).withName(prefix + a.name))
  }

  /** Logical marker node; carries resolved key/time expressions. */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      prefix: String)
    extends BinaryNode {
    override def output: Seq[Attribute] =
      outputOf(left.output, right.output, rightKeys, prefix)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one physical choice, the merge-scan exec. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: AsOfJoinPlan =>
        AsOfJoinExec(planLater(p.left), planLater(p.right),
          p.leftKeys, p.rightKeys, p.leftTime, p.rightTime, p.prefix) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      prefix: String)
    extends BinaryExecNode {

    override def output: Seq[Attribute] =
      outputOf(left.output, right.output, rightKeys, prefix)

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

    override protected def doExecute(): RDD[InternalRow] = {
      val leftOut = left.output
      val rightOut = right.output
      val outAttrs = output
      val lKeyExprs = leftKeys
      val rKeyExprs = rightKeys
      val lTimeExpr = leftTime
      val rTimeExpr = rightTime
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
        val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
        val timeOrd = TypeUtils.getInterpretedOrdering(lTimeExpr.dataType)
        val timeType = lTimeExpr.dataType
        // bind against a NULLABLE view of the right side: the no-match
        // path substitutes an all-null row, and a BoundReference built
        // from a non-nullable input attr would skip its null check and
        // read zeros instead of emitting null
        val joiner = UnsafeProjection.create(outAttrs,
          leftOut ++ rightOut.map(_.withNullability(true)))
        val nullRight = new GenericInternalRow(rightOut.size)
        val joined = new JoinedRow

        val buffered = rIter.buffered
        var lastMatch: InternalRow = null
        var lastMatchKey: InternalRow = null

        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lt = lTimeProj(lRow).get(0, timeType)
          if (!lKey.anyNull && lt != null) {
            // consume right rows at earlier keys, or same key and time <= lt
            var advancing = true
            while (advancing && buffered.hasNext) {
              val head = buffered.head
              val rKey = rKeyProj(head)
              val cmp = keyOrd.compare(rKey, lKey)
              val rt = if (cmp == 0) rTimeProj(head).get(0, timeType) else null
              if (cmp < 0 || (cmp == 0 && (rt == null || timeOrd.lteq(rt, lt)))) {
                val consumed = buffered.next()
                if (cmp == 0 && rt != null && !rKeyProj(consumed).anyNull) {
                  // rows arrive time-ascending: each one supersedes the last
                  lastMatch = consumed.copy()
                  lastMatchKey = rKeyProj(consumed).copy()
                }
              } else advancing = false
            }
          }
          val matched = lastMatch != null && !lKey.anyNull &&
            keyOrd.compare(lastMatchKey, lKey) == 0
          joiner(joined(lRow, if (matched) lastMatch else nullRight))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Column-level API mirroring `graft.operators.AsOfJoin.backward`:
    * left columns + prefixed right payload columns (right time included,
    * keys excluded), null payload when no right row precedes.
    *
    * Side effect: if the session was built WITHOUT the GraftExtensions
    * config, this installs [[AsOfJoinStrategy]] session-wide via
    * `experimentalMethods.extraStrategies` so the plan below can be
    * executed. The check-then-set is synchronized on the
    * ExperimentalMethods instance — concurrent query builders on one
    * session must not race into a lost update or a duplicate entry
    * (r02 ADVICE). */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      prefix: String = "asof_"): DataFrame = {
    // fresh exprIds on the right side so self-joins can't collide
    val rFresh = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // self-register on sessions built without the GraftExtensions config
    // (idempotent; extraStrategies run before the built-in ones)
    val em = spark.sessionState.experimentalMethods
    em.synchronized {
      if (!em.extraStrategies.contains(AsOfJoinStrategy)) {
        em.extraStrategies = AsOfJoinStrategy +: em.extraStrategies
      }
    }
    Dataset.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
        attr(lPlan, leftTime), attr(rPlan, rightTime), prefix))
  }
}
