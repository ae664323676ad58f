package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Dev-tool shim: drain the listener bus so per-query job/stage counters
  * (graft.JobAudit) read a settled value. `listenerBus` is private[spark],
  * hence this one-liner lives under the org.apache.spark namespace — the
  * standard extension-point trick, same as the Catalyst expressions in this
  * package. Never used by library code paths.
  */
object ListenerSync {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
