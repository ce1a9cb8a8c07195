package graft.examples

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** The runnable examples are user-facing documentation — keep them
  * executing end-to-end (their mains are also driven by the verify
  * recipe, but a spec fails fast in CI).
  */
class ExamplesSpec extends SparkTestBase {

  test("DataPipeline: routed curation chain resolves, sample knob narrows") {
    val wkf = DataPipeline.build(spark, sfDir)
    val packed = wkf.run("docs.packed").asInstanceOf[DataFrame].cache()
    assert(packed.count() > 0)
    assert(packed.columns.toSet == Set("doc_id", "lang", "n_tokens", "bin_id"))
    val at20 = wkf.run("docs.packed", "pct" -> 20).asInstanceOf[DataFrame].count()
    assert(at20 < packed.count(), s"pct=20 ($at20) should keep fewer than pct=50 (${packed.count()})")
  }

  test("MlPipeline: train/infer routes resolve with config") {
    val wkf = MlPipeline.build(spark, sfDir)
    val scored = wkf.run("infer-test").asInstanceOf[DataFrame]
    assert(scored.columns.contains("abs_err") && scored.count() > 0)
  }
}
