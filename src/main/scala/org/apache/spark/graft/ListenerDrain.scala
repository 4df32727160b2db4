package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; draining it is the only
  * reliable way to read complete task metrics right after an action (the
  * bus is async). Same one-file package-escape pattern as
  * [[org.apache.spark.sql.graft.Bridge]].
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
