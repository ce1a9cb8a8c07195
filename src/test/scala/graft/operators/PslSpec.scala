package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Public-suffix-list rule semantics (t35's registrable-domain core):
  * normal vs wildcard vs exception precedence, private hosting
  * suffixes, public-suffix-itself → NULL, and the documented
  * divergences (bare-host passthrough, IP literals). The DuckDB twin
  * is generated from the same rule data — parity is re-pinned here
  * value-by-value so the oracle can't silently drift.
  */
class PslSpec extends SparkTestBase {
  import spark.implicits._

  private def reg(hosts: String*): Seq[Option[String]] =
    hosts.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "host")
      .orderBy($"i")
      .select(Psl.registrableDomain($"host")).collect()
      .map(r => Option(r.getString(0))).toSeq

  test("normal rules: longest match wins, gTLD/ccSLD/3-label, unknown TLD default") {
    assert(reg(
      "www.example.com", "deep.cdn.example.co.uk", "example.co.uk",
      "a.b.k12.ca.us", "example.unknowntld", "sub.example.unknowntld") == Seq(
      Some("example.com"), Some("example.co.uk"), Some("example.co.uk"),
      Some("b.k12.ca.us"), Some("example.unknowntld"), Some("example.unknowntld")))
  }

  test("private hosting suffixes: the registrable domain is the TENANT") {
    assert(reg(
      "myblog.blogspot.com", "www.myblog.blogspot.com",
      "user.github.io", "bucket.s3.amazonaws.com") == Seq(
      Some("myblog.blogspot.com"), Some("myblog.blogspot.com"),
      Some("user.github.io"), Some("bucket.s3.amazonaws.com")))
  }

  test("wildcard rules: *.ck makes foo.ck a public suffix; one more label registers") {
    assert(reg(
      "foo.ck",                 // IS a public suffix under *.ck
      "www.foo.ck",             // suffix foo.ck + one label
      "a.www.foo.ck",           // deeper subdomain, same registrable
      "other.kawasaki.jp",      // public suffix under *.kawasaki.jp
      "site.other.kawasaki.jp") == Seq(
      None, Some("www.foo.ck"), Some("www.foo.ck"),
      None, Some("site.other.kawasaki.jp")))
  }

  test("exception rules prevail over wildcards: !www.ck, !city.kawasaki.jp") {
    assert(reg(
      "www.ck", "sub.www.ck",
      "city.kawasaki.jp", "x.city.kawasaki.jp") == Seq(
      Some("www.ck"), Some("www.ck"),
      Some("city.kawasaki.jp"), Some("city.kawasaki.jp")))
  }

  test("public suffixes themselves have no registrable domain; bare rule-less hosts pass through") {
    // kawasaki.jp is NOT itself a public suffix (only *.kawasaki.jp
    // is): it registers normally under the plain jp rule
    assert(reg("com", "co.uk", "blogspot.com", "kawasaki.jp", "localhost", "intranet-box") == Seq(
      None, None, None, Some("kawasaki.jp"), Some("localhost"), Some("intranet-box")))
  }

  test("the generated oracle SQL derives from the SAME rule data (every family present)") {
    // value-level cross-engine parity is gated by the driver's t35
    // oracle run (and check_oracle locally); in-JVM we pin that the
    // generated SQL carries every rule family, so a rules edit that
    // forgot one side cannot pass silently
    val gen = Psl.duckRegistrableDomain("host")
    assert(gen.contains("'co.uk'") && gen.contains("'blogspot.com'") &&
      gen.contains("'ck'") && gen.contains("'kawasaki.jp'") &&
      gen.contains("'www.ck'") && gen.contains("'city.kawasaki.jp'") &&
      gen.contains("'k12.ca.us'"),
      "generated oracle SQL is missing a rule family")
  }
}
