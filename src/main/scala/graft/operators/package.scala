package graft

import org.apache.spark.sql.DataFrame

package object operators {

  /** Syntax for [[Ops.checkpointFrame]] — every iterative loop's
    * lineage cut goes through the one reliable-vs-local knob
    * (`spark.graft.checkpoint.reliable`; see checkpointFrame's doc).
    * `Lazy` mirrors localCheckpoint(eager = false) (materialized by
    * the next action), `Eager` mirrors localCheckpoint().
    */
  implicit final class GraftCheckpointOps(private val df: DataFrame) extends AnyVal {
    def graftCheckpointLazy: DataFrame = Ops.checkpointFrame(df, eager = false)
    def graftCheckpointEager: DataFrame = Ops.checkpointFrame(df, eager = true)
  }
}
