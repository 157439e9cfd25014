package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.SetKernels

/** Public forwarders for the native set-overlap kernels
  * (`org.apache.spark.sql.graft.SetKernels`). */
object SetFunctions {

  /** |a ∩ b| over SORTED, distinct, null-free string arrays (two-pointer
    * codegen merge — see SetKernels for the sortedness contract). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    SetKernels.sortedIntersectCount(a, b)
}
