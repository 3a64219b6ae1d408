package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener bus so the bench can
  * drain all in-flight listener events before snapshotting its
  * per-query telemetry (listener delivery is asynchronous; without a
  * drain, a query's last stages could be attributed to the NEXT
  * query). Lives in an `org.apache.spark` subpackage solely for
  * access; contains no logic of its own. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
