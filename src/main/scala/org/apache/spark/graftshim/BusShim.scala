package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus: lets the bench/profiler
  * wait until all task-end events have been delivered before reading
  * task-metric accumulators, instead of sleeping a fixed interval and
  * hoping the async bus has drained (the bus is usually empty in
  * single-digit milliseconds; a fixed 500 ms sleep × 115 queries × 2
  * reps would cost the bench ~2 minutes of dead time).
  */
object BusShim {
  def drain(sc: SparkContext, timeoutMs: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        // Never silent: a timed-out drain means the metrics read next
        // is INCOMPLETE — exactly the truncation this exists to stop.
        System.err.println(
          s"[busshim] listener bus not drained after ${timeoutMs} ms; " +
            "shuffle-byte readings may be under-counted")
    }
}
