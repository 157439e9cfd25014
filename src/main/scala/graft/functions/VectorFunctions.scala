package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.VectorKernels

/** Public surface for the dense-vector codegen kernels (SURVEY.md §4.2).
  * Implementation lives in `org.apache.spark.sql.graft.VectorKernels`
  * because Catalyst's extension points are `private[sql]`.
  */
object VectorFunctions {
  /** Cosine similarity between two `array<float>` columns. */
  def cosineSim(a: Column, b: Column): Column = VectorKernels.cosineSim(a, b)

  /** Dot product of two `array<float>` columns (double accumulation). */
  def dotProduct(a: Column, b: Column): Column = VectorKernels.dotProduct(a, b)

  /** Euclidean norm of an `array<float>` column. */
  def l2Norm(a: Column): Column = VectorKernels.l2Norm(a)
}
