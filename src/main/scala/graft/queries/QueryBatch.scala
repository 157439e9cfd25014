package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A registered tranche of the operator registry: every batch object
  * (Relational, WindowsFuncs, SurfaceR5 … SurfaceR11a) exposes its
  * queries and the DuckDB oracle SQL for the oracle-checkable subset.
  * [[graft.SparkEntry]] folds the single ordered batch list instead of
  * maintaining two parallel 160-line Seq literals (the VERDICT r10
  * consolidation item): registering a batch is now ONE line, and the
  * queries/oracleSql lists cannot drift out of sync.
  */
trait QueryBatch {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
