package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into the `private[spark]` listener bus: JobCountSpec
  * needs a DETERMINISTIC drain of queued SparkListener events before it
  * reads its job counter — `Thread.sleep` under-counts on a loaded
  * machine (VERDICT r9 nit). Lives in an org.apache.spark subpackage
  * solely to reach the package-private member; test classpath only. */
object ListenerBridge {
  /** Block until every queued listener event has been delivered (or the
    * timeout elapses — then a java.util.concurrent.TimeoutException
    * surfaces the backlog). */
  def waitUntilListenersDrained(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
