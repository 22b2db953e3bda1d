package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus` (scoped `private[spark]`) so the
  * bench can DRAIN the async listener bus between timed runs — without
  * the drain, stage-completion events still in flight would credit one
  * query's GC/task time to the next.  Same technique (and the same
  * documented-shim discipline) as [[org.apache.spark.sql.graftshim.ColumnShim]].
  */
object ListenerShim {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
