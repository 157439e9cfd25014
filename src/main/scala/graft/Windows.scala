package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.graft.BoundedPartition

/** Global-order windows over PROVABLY BOUNDED relations.
  *
  * `Window.orderBy(...)` with no partition spec plans as Exchange
  * SinglePartition and fires WindowExec's "No Partition Defined"
  * warning. That warning is this repo's scale tripwire — it must mean
  * "a data-scaling relation is being funnelled through one task",
  * nothing else. Queries whose window input is bounded BY CONSTRUCTION
  * (an aggregate over #days / #weeks / #sources / #bins / numPartitions
  * — cardinalities that do not grow with corpus size) use this helper
  * instead: partitioning by a constant keeps the exact same semantics
  * and single-task execution, but keeps the tripwire silent so a
  * genuine scale-killer can't hide in routine noise. The constant must
  * be [[org.apache.spark.sql.graft.BoundedPartitionKey]] — a plain
  * `lit(0)` is foldable and Catalyst strips it from the partition spec
  * before it reaches WindowExec, re-arming the warning.
  *
  * Contract: ONLY call this when the window's input row count is
  * independent of fact-table size (SurfaceR8kSpec's plan audit asserts
  * the consuming queries feed their windows from aggregate-derived
  * relations). For data-scaling ordinals/cumsums use
  * [[graft.operators.GlobalRowId]] / [[graft.operators.PrefixSum]].
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §4.3 (plan-shape discipline).
  */
object Windows {

  /** A global-order window spec over a bounded relation. */
  def bounded(order: Column*): WindowSpec =
    Window.partitionBy(BoundedPartition.key).orderBy(order: _*)
}
