package graft

import org.apache.spark.sql.Dataset
import graft.core.Workflow

/** Spark binding for the workflow materialization policy (SURVEY.md
  * §2.1 C9): by default graft cells compose ONE lazy Catalyst plan;
  * a cell marked `.cached()` / `.checkpointed()` pins its result so
  * downstream cells reuse the materialization instead of recomputing —
  * the Spark-native analogue of the reference's per-run result dict
  * (workflow.py:217 `self.cache`), but opt-in, because recomputation
  * through one fused plan is usually cheaper than caching at 100 TB.
  */
object Materializers {

  /** Install cache/checkpoint handling on a workflow. */
  def spark(wkf: Workflow): Workflow = {
    wkf.materializer = (cell, res) =>
      res match {
        case ds: Dataset[_] =>
          cell.materializePolicy match {
            case Some("cache") => ds.cache()
            case Some("checkpoint") =>
              // the Ops.checkpointFrame knob, type-preservingly (this
              // is the one Dataset[T]-generic site). Reliable mode
              // persists first: rdd.checkpoint reruns the lineage in
              // a separate write job unless cached — same sequence as
              // checkpointFrame, kept in sync by MaterializersSpec.
              if (ds.sparkSession.conf
                  .getOption("spark.graft.checkpoint.reliable").exists(_.toBoolean)) {
                val cached =
                  ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                val out = cached.checkpoint(eager = true)
                cached.unpersist()
                out
              } else ds.localCheckpoint()
            case _ => ds
          }
        case other => other
      }
    wkf
  }
}
