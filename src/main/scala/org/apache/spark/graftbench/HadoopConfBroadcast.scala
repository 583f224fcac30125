package org.apache.spark.graftbench

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Public wrapper around Spark's `private[spark]` SerializableConfiguration
  * so executor-side code outside the spark package can read files with the
  * session's Hadoop configuration (credentials, FS impls) instead of a
  * default `new Configuration()` that would miss them. Same package-shim
  * pattern as [[BusFlush]].
  */
final class HadoopConfBroadcast private (
    private val b: Broadcast[SerializableConfiguration])
  extends Serializable {
  def value: Configuration = b.value.value
}

object HadoopConfBroadcast {
  def apply(sc: SparkContext): HadoopConfBroadcast =
    new HadoopConfBroadcast(SerializableConfiguration.broadcast(sc))

  /** Broadcast a CALLER-SUPPLIED Configuration (e.g. the SESSION conf
    * from `sessionState.newHadoopConf()`, which carries session-scoped
    * `spark.hadoop.*` overrides the bare SparkContext conf lacks).
    */
  def apply(sc: SparkContext, conf: Configuration): HadoopConfBroadcast =
    new HadoopConfBroadcast(sc.broadcast(new SerializableConfiguration(conf)))
}
