package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, IntegerType}

/** A constant-zero partition key the optimizer CANNOT fold away.
  *
  * `Window.partitionBy(lit(0))` keeps the same single-partition
  * execution as an unpartitioned window while silencing WindowExec's
  * "No Partition Defined" warning — but Catalyst strips foldable
  * partition expressions during optimization, so the literal never
  * reaches the physical plan and the warning fires anyway. This leaf
  * expression evaluates to 0, is deterministic (legal in a window
  * partition spec, stable under re-execution), but reports
  * foldable=false (the LeafExpression default), so it SURVIVES to
  * WindowExec's partitionSpec: all rows hash to one partition — the
  * intended semantics for provably bounded inputs — and the warning
  * stays a meaningful scale tripwire for genuinely unpartitioned
  * windows. See graft.Windows for the only sanctioned call site.
  */
case class BoundedPartitionKey() extends LeafExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = 0
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(s"final int ${ev.value} = 0;")).code(),
      isNull = FalseLiteral)
  override def prettyName: String = "graft_bounded_partition_key"
}

object BoundedPartition {
  /** The non-foldable constant key as a Column. */
  def key: Column = ExpressionUtils.column(BoundedPartitionKey())
}
