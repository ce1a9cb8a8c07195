package graft

import graft.core.Workflow
import graft.tables.Tables
import org.apache.spark.sql.DataFrame

/** C9: the Spark materialization policy pins a cell's result when
  * opted in, and leaves plans lazy otherwise.
  */
class MaterializersSpec extends SparkTestBase {

  test("cached cell materializes with a storage level; default stays lazy") {
    Workflow.unregister("mat-spec")
    val wkf = Materializers.spark(new Workflow("mat-spec"))
    wkf.provide("lazy") { _ => Tables.load(spark, sfDir, "nation") }
    wkf.provide("pinned") { _ => Tables.load(spark, sfDir, "region") }.cached()

    val lazyDf = wkf.run("lazy").asInstanceOf[DataFrame]
    assert(lazyDf.storageLevel == org.apache.spark.storage.StorageLevel.NONE)

    val pinned = wkf.run("pinned").asInstanceOf[DataFrame]
    assert(pinned.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    assert(pinned.count() == 5)
    pinned.unpersist()
  }
}
