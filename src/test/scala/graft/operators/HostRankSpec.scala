package graft.operators

import graft.SparkTestBase

/** g12: domain PageRank over extracted outlinks — node universe and
  * rank sanity (the value level is oracle-gated).
  */
class HostRankSpec extends SparkTestBase {

  test("g12: full domain universe, ranks ordered, dangling sinks ranked") {
    val rows = graft.SparkEntry.queries("g12_host_rank")(spark, sfDir).collect()
    val nodes = rows.map(_.getAs[String]("node")).toSet
    assert(nodes == Set("example0.com", "example1.com", "example2.com",
      "example.org", "example.net"))
    val fps = rows.map(_.getAs[Long]("rank_fp"))
    assert(fps.sameElements(fps.sorted.reverse), "rows ordered by rank_fp desc")
    assert(fps.forall(_ > 0L))
    // the two pure sinks receive cross-domain mass from every source
    // family; each source's rank is diluted by its self-loops — the
    // sinks must outrank nothing less than the damping floor
    val floor = 150000000000L // (1 - d) * Scale
    assert(fps.forall(_ >= floor))
  }
}
