package graft.operators

import graft.SparkTestBase

/** O61: redirect-chain resolution — verdicts, hop counts, relative
  * Locations, loop detection, recrawl edge dedup policy.
  */
class RedirectsSpec extends SparkTestBase {

  private def run(rows: Seq[(String, Int, String)],
      maxHops: Int = 4, tsCol: Option[String] = None,
      ts: Map[String, Long] = Map.empty): Map[String, (String, Long, String)] = {
    val df =
      if (tsCol.isEmpty)
        spark.createDataFrame(rows).toDF("url", "status", "location")
      else
        spark.createDataFrame(rows.map(r => (r._1, r._2, r._3, ts.getOrElse(r._1 + r._3, 0L))))
          .toDF("url", "status", "location", "ts")
    Redirects.chains(df, maxHops = maxHops, tsCol = tsCol).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("verdicts: ok, dangling, loop, capped") {
    val out = run(Seq(
      ("https://h/a", 301, "/b"),
      ("https://h/b", 302, "/c"),
      ("https://h/c", 200, null),
      ("https://h/d", 301, "https://other/x"), // never fetched
      ("https://h/e", 307, "/f"),
      ("https://h/f", 307, "/e"), // 2-cycle
      ("https://h/g1", 301, "/g2"),
      ("https://h/g2", 301, "/g3"),
      ("https://h/g3", 301, "/g4"),
      ("https://h/g4", 301, "/g5"),
      ("https://h/g5", 301, "/c")), maxHops = 4)
    assert(out("https://h/a") == (("https://h/c", 2L, "ok")))
    assert(out("https://h/c") == (("https://h/c", 0L, "ok")))
    assert(out("https://h/d") == (("https://other/x", 1L, "dangling")))
    assert(out("https://h/e")._3 == "loop")
    assert(out("https://h/f")._3 == "loop")
    // g1 walks 4 hops to g5 which still redirects -> capped
    assert(out("https://h/g1") == (("https://h/g5", 4L, "capped")))
    assert(out("https://h/g2") == (("https://h/c", 4L, "ok")))
  }

  test("relative Location resolves against the redirecting url (X25)") {
    val out = run(Seq(
      ("https://h/dir/a", 301, "../up/x"),
      ("https://h/up/x", 200, null)))
    assert(out("https://h/dir/a") == (("https://h/up/x", 1L, "ok")))
  }

  test("3xx without Location is a terminal, not an edge") {
    val out = run(Seq(("https://h/a", 301, null)))
    assert(out("https://h/a") == (("https://h/a", 0L, "ok")))
  }

  test("recrawl dedup: latest ts wins when tsCol given, min(dst) otherwise") {
    val rows = Seq(
      ("https://h/a", 301, "/old"),
      ("https://h/a", 301, "/new"))
    val byMin = run(rows)
    assert(byMin("https://h/a")._1 == "https://h/new") // '/new' < '/old'
    val byTs = run(rows, tsCol = Some("ts"),
      ts = Map("https://h/a/old" -> 9L, "https://h/a/new" -> 1L))
    assert(byTs("https://h/a")._1 == "https://h/old")
  }

  test("t40 covers every verdict on testdata") {
    val out = graft.SparkEntry.queries("t40_redirects")(spark, sfDir).collect()
    val verdicts = out.groupBy(_.getAs[String]("verdict")).view.mapValues(_.length).toMap
    assert(Set("ok", "dangling", "loop", "capped").subsetOf(verdicts.keySet), verdicts)
    // a complete family: 0-hop terminals through the 4-hop boundary 'ok'
    val byUrl = out.map(r => r.getAs[String]("url") ->
      ((r.getAs[Long]("n_hops"), r.getAs[String]("verdict")))).toMap
    val u = (k: Int) => s"https://r.example.com/u/$k"
    assert(byUrl(u(0)) == ((0L, "ok")))
    assert(byUrl(u(6)) == ((4L, "ok")))
    assert(byUrl(u(7)) == ((4L, "capped")))
    assert(byUrl(u(8)) == ((1L, "dangling")))
    assert(byUrl(u(9))._2 == "loop")
    assert(byUrl(u(11)) == ((1L, "dangling")))
  }
}
