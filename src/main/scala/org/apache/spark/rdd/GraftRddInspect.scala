package org.apache.spark.rdd

/** private[rdd] access shim: lets graft.CacheLifecycle classify block-
  * manager residue as localCheckpoint blocks (by-design transient)
  * versus plain persisted frames (a lifecycle leak unless allowlisted).
  * `RDD.isLocallyCheckpointed` is the authoritative flag and is
  * package-private to org.apache.spark.rdd, hence this forwarder.
  */
object GraftRddInspect {
  def isLocalCheckpoint(r: RDD[_]): Boolean =
    r.isLocallyCheckpointed || r.isCheckpointed
}
