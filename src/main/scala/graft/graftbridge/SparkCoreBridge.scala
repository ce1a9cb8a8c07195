package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Core-side twin of the sql Bridge: `LiveListenerBus.waitUntilEmpty`
  * is `private[spark]`, and Bench needs it so per-sample task-metric
  * deltas (GC / executor run time) are read only after every TaskEnd
  * event for the sample has been delivered — without the flush the
  * async bus attributes a sample's tail events to the next sample.
  */
object SparkCoreBridge {
  def flushListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** Ship the driver's Hadoop configuration (incl. `spark.hadoop.*`
    * overrides — S3/GCS credentials, endpoints) to executors.
    * `SerializableConfiguration` is `private[spark]`, so the factory
    * lives in this bridge and hides it behind a serializable thunk.
    */
  def hadoopConfFactory(sc: SparkContext): () => org.apache.hadoop.conf.Configuration = {
    val ser = new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration)
    () => ser.value
  }
}
