package org.apache.spark.graftbench

import org.apache.spark.sql.SparkSession

/** Lives in the org.apache.spark namespace solely to reach the
  * `private[spark]` listener bus: graft.Bench flushes pending listener
  * events before snapshotting its shuffle-byte counter, so asynchronous
  * event delivery cannot attribute one query's shuffle volume to the next.
  * No Spark internals are modified — this only calls `waitUntilEmpty`.
  */
object BusFlush {
  def flush(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(10000L)
}
