package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge to the private[spark] listener bus drain — lets a
  * spec count Spark jobs deterministically (listener events post
  * asynchronously; without the drain a job-count assertion races the
  * bus thread).
  */
object TestListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
