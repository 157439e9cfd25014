package org.apache.spark.sql.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** private[spark] access shims for the bench's self-diagnosis.
  *
  * Lives under org.apache.spark so it can call
  * `SparkContext.listenerBus.waitUntilEmpty()` — listener events post
  * asynchronously, and without the drain a probe's spill bytes would be
  * attributed to whichever probe runs next.
  */
object ListenerBridge {

  /** Per-probe task-metric accumulator: shuffle/agg spill volumes are
    * the "did the block manager squeeze execution memory" signal the
    * round-11 bench outliers lacked. Register once, `reset()` before a
    * probe, `drain(sc)` + read after it. */
  final class SpillTally extends SparkListener {
    val memSpilled = new AtomicLong(0L)
    val diskSpilled = new AtomicLong(0L)
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) {
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { memSpilled.set(0L); diskSpilled.set(0L) }
  }

  def register(sc: SparkContext): SpillTally = {
    val t = new SpillTally
    sc.addSparkListener(t)
    t
  }

  /** Block until all queued listener events are delivered (10 s cap —
    * diagnostics must never wedge the bench). */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: Throwable => () }
}
