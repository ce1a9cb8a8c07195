package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** X22/X23/X24 vs the columnar regex chain they replaced: byte
  * equality over adversarial URL generators AND raw soup — the
  * chain (hostOfRef / canonicalUrlRef / Psl.registrableDomainRef)
  * is the executable definition, including its regex backtracking
  * quirks (last-'@' userinfo with fallback, bracketed-host
  * alternation, port digits to the authority end, first-'?' query,
  * trailing-empty split semantics). The oracle twins restate the
  * SAME chain in DuckDB, so chain==expression means the oracle
  * still gates the expression path.
  */
class UrlParityFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(163L + i)))

  private val scheme = Gen.oneOf("https", "HTTP", "ftp", "a+b-c.", "x", "9bad", "")
  private val sep = Gen.oneOf("://", ":/", "//", ":", "")
  private val userinfo = Gen.oneOf("", "u@", "user:pw@", "a@b@", "u:12345pw@", "@", "@@")
  private val hostG = Gen.oneOf(
    "example.com", "EXAMPLE.Com.", "www.example.co.uk", "foo.blogspot.com",
    "a.b.k12.ca.us", "x.y.ck", "www.ck", "city.kawasaki.jp", "127.0.0.1",
    "1.2.3.4.5", "localhost", "[2001:db8::1]", "[::1]", "[2001", "[a@b]",
    "[ab]cd", "com", "co.uk", "a..b", "...", "", "xn--bcher-kva.de",
    "host_with_under", "a-b.c-d.org")
  private val portG = Gen.oneOf("", ":80", ":443", ":8080", ":0443", ":8a", ":",
    ":99999999999999999999")
  private val pathG = Gen.oneOf("", "/", "/x/y.html", "//double", "/p?inner",
    "/sp ace", "/%2e%2e")
  private val queryG = Gen.oneOf("", "?", "?a=1&b=2", "?b=2&a=1", "?utm_source=x&a=1",
    "?gclid=9", "?a=1?b=2", "?x=9?b=2", "?&&a=1&", "?utm_", "?fbclid",
    "?z=%20&a=+", "?a=1&a=0")
  private val fragG = Gen.oneOf("", "#", "#frag", "#/search?q=x", "#a?b")

  private val urlG: Gen[String] = for {
    s <- scheme; j <- sep; u <- userinfo; h <- hostG; p <- portG
    pa <- pathG; q <- queryG; f <- fragG
  } yield s + j + u + h + p + pa + q + f

  private val soupG: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(':', '/', '@', '[', ']', '?', '#',
        '&', '=', '.', '-', '%', ' ', 'é'))).map(_.mkString))

  private def checkParity(values: Seq[String]): Unit = {
    val df = values.zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "url")
      .orderBy($"i")
    val rows = df.select(
      $"url",
      UrlCuration.hostOf($"url").as("h_new"),
      UrlCuration.hostOfRef($"url").as("h_ref"),
      UrlCuration.canonicalUrl($"url").as("c_new"),
      UrlCuration.canonicalUrlRef($"url").as("c_ref"),
      Psl.registrableDomain(UrlCuration.hostOfRef($"url")).as("d_new"),
      Psl.registrableDomainRef(UrlCuration.hostOfRef($"url")).as("d_ref"),
      // registrable domain over the RAW value too (direct-call parity)
      Psl.registrableDomain($"url").as("r_new"),
      Psl.registrableDomainRef($"url").as("r_ref")
    ).collect()
    rows.foreach { r =>
      val u = r.getString(0)
      assert(r.get(1) == r.get(2), s"hostOf parity broke on <$u>: ${r.get(1)} vs ${r.get(2)}")
      assert(r.get(3) == r.get(4), s"canonicalUrl parity broke on <$u>: ${r.get(3)} vs ${r.get(4)}")
      assert(r.get(5) == r.get(6), s"registrableDomain parity broke on host of <$u>: ${r.get(5)} vs ${r.get(6)}")
      assert(r.get(7) == r.get(8), s"registrableDomain raw parity broke on <$u>: ${r.get(7)} vs ${r.get(8)}")
    }
  }

  test("structured adversarial URLs: expression == columnar chain (3000 samples)") {
    checkParity(samples(urlG, 3000))
  }

  test("raw character soup: expression == columnar chain (1500 samples)") {
    checkParity(samples(soupG, 1500))
  }

  test("null propagates identically") {
    val df = Seq((1, null: String)).toDF("i", "url")
    val r = df.select(
      UrlCuration.hostOf($"url"), UrlCuration.canonicalUrl($"url"),
      Psl.registrableDomain($"url")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("SQL surface: canonical_url / url_host / registrable_domain registered") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT canonical_url('HTTPS://u@Ex.Com.:443/p?b=2&utm_s=1&a=1#f') AS c, " +
        "url_host('https://a@b@x.example.ORG/z') AS h, " +
        "registrable_domain('www.myblog.blogspot.com') AS d").head()
    assert(r.getString(0) == "https://ex.com/p?a=1&b=2", r.getString(0))
    assert(r.getString(1) == "x.example.org")
    assert(r.getString(2) == "myblog.blogspot.com")
  }

  test("SQL surface: resolve_url registered (X25)") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT resolve_url('https://ex.com/a/b/p.html', '../x#f') AS t, " +
        "resolve_url('https://ex.com/', 'mailto:a@b.c') AS skip").head()
    assert(r.getString(0) == "https://ex.com/a/x")
    assert(r.isNullAt(1))
  }
}
