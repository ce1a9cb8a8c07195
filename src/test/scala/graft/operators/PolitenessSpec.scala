package graft.operators

import graft.SparkTestBase
import graft.functions.Robots
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt semantics (X20/X21 + the O58 gate): group
  * selection, longest-match with wildcards and $ anchors, allow-wins
  * ties, empty disallow, missing robots default, and the broadcast
  * join shape of the operator form. Plus the fetch-metadata columns
  * (http_status / mime_type).
  */
class PolitenessSpec extends SparkTestBase {
  import spark.implicits._

  private val robotsTxt =
    """# corpus crawler policy
      |User-agent: badbot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/press/
      |Disallow: /*.pdf$
      |Disallow: /tmp*
      |
      |User-agent: *
      |Disallow: /search
      |Crawl-delay: 10
      |""".stripMargin

  test("group selection: specific agent over *, shared agent runs, full-block groups") {
    val (_, disGraft) = Robots.rulesFor(robotsTxt, "GraftBot/1.0")
    assert(disGraft.toSet == Set("/private/", "/*.pdf$", "/tmp*"))
    val (_, disOther) = Robots.rulesFor(robotsTxt, "otherbot")
    assert(disOther.toSet == Set("/private/", "/*.pdf$", "/tmp*"),
      "consecutive User-agent lines must share one group")
    val (_, disBad) = Robots.rulesFor(robotsTxt, "BadBot")
    assert(disBad == Seq("/"))
    val (_, disAnon) = Robots.rulesFor(robotsTxt, "randombot")
    assert(disAnon == Seq("/search"), "fallback group is *")
  }

  test("RFC 9309 §2.2.1: two groups matching at the same token COMBINE their rules") {
    val txt = "User-agent: graftbot\nDisallow: /a/\n\n" +
      "User-agent: graftbot\nDisallow: /b/\nAllow: /b/ok/\n"
    val (allow, dis) = Robots.rulesFor(txt, "graftbot")
    assert(dis.toSet == Set("/a/", "/b/") && allow == Seq("/b/ok/"),
      s"same-token groups did not combine: allow=$allow dis=$dis")
    assert(!Robots.allowed("/a/x", allow, dis) && !Robots.allowed("/b/x", allow, dis))
    assert(Robots.allowed("/b/ok/x", allow, dis))
  }

  test("longest match wins; allow beats disallow on ties; wildcards and $ anchor") {
    val (allow, dis) = Robots.rulesFor(robotsTxt, "graftbot")
    def ok(p: String) = Robots.allowed(p, allow, dis)
    assert(!ok("/private/x.html"))           // disallow /private/
    assert(ok("/private/press/release.html")) // longer allow wins
    assert(!ok("/docs/file.pdf"))            // /*.pdf$ wildcard+anchor
    assert(ok("/docs/file.pdf?x=1"))         // $ anchor: query breaks it
    assert(!ok("/tmp/cache"))                // /tmp* prefix wildcard
    assert(ok("/public/index.html"))         // no match -> allowed
    assert(ok("/"))                          // root untouched for graftbot
  }

  test("'$' anchors are SUFFIX matches; '**' runs are no-ops; empty agent tokens are ignored") {
    // /*.php$ must catch /index.php.php (the first '.php' occurrence
    // is not the only candidate — regex semantics backtrack)
    val (a1, d1) = Robots.rulesFor("User-agent: *\nDisallow: /*.php$\n", "x")
    assert(!Robots.allowed("/index.php.php", a1, d1))
    assert(!Robots.allowed("/x.php", a1, d1))
    assert(Robots.allowed("/x.php?y=1", a1, d1)) // anchor broken by query
    // consecutive stars are one star, not jump-to-end
    val (a2, d2) = Robots.rulesFor("User-agent: *\nDisallow: /private**/secret\n", "x")
    assert(!Robots.allowed("/privateX/secret", a2, d2))
    assert(Robots.allowed("/privateX/open", a2, d2))
    // an EMPTY User-agent token must not hijack the '*' group (it
    // would substring-match every agent at specificity 0)
    val (a3, d3) = Robots.rulesFor(
      "User-agent:\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n", "anybot")
    assert(Robots.allowed("/a", a3, d3) && !Robots.allowed("/b", a3, d3),
      s"empty agent token hijacked the fallback group: allow=$a3 dis=$d3")
  }

  test("fuzz: matchLen == java.util.regex semantics ('*' any run, '$' end anchor, prefix match)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val seg = Gen.oneOf("/", "a", "b", ".php", "x/", "", "aa")
    val patG = for {
      n <- Gen.chooseNum(1, 4)
      parts <- Gen.listOfN(n, seg)
      anchor <- Gen.oneOf("", "$")
    } yield parts.mkString("*") + anchor
    val pathG = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("/", "a", "b", ".", "p", "h", "x")).map("/" + _.mkString))
    val cases = (0 until 2500).flatMap(i =>
      (for { p <- patG; q <- pathG } yield (p, q))
        .apply(Gen.Parameters.default, Seed(77L + i)))
    cases.foreach { case (pattern, path) =>
      val anchored = pattern.endsWith("$")
      val pat = if (anchored) pattern.dropRight(1) else pattern
      val re = ("^" + pat.split("\\*", -1).map(s =>
        if (s.isEmpty) "" else java.util.regex.Pattern.quote(s)).mkString(".*") +
        (if (anchored) "$" else "")).r.pattern
      val expected = re.matcher(path).lookingAt()
      val got = Robots.matchLen(path, pattern) >= 0
      assert(got == expected,
        s"matchLen diverged from regex on pattern=<$pattern> path=<$path>: got $got want $expected")
    }
  }

  test("duplicate host rows in the robots store collapse: one verdict row per url") {
    val robots = Seq(
      ("dup.example.com", "User-agent: *\nDisallow: /x\n"),
      ("dup.example.com", "User-agent: *\nDisallow: /y\n") // re-fetch
    ).toDF("host", "robots_txt")
    val urls = Seq((1L, "https://dup.example.com/x")).toDF("id", "url")
    val out = Politeness.withRobotsVerdict(urls, Politeness.robotsRules(robots))
    assert(out.count() == 1L, "duplicate robots rows fanned the url out")
  }

  test("empty disallow matches nothing; empty/missing robots allows all") {
    val (a1, d1) = Robots.rulesFor("User-agent: *\nDisallow:\n", "x")
    assert(Robots.allowed("/anything", a1, d1))
    assert(d1.isEmpty, "empty Disallow value must be dropped")
    val (a2, d2) = Robots.rulesFor("", "x")
    assert(Robots.allowed("/anything", a2, d2))
    // malformed soup never throws
    val (a3, d3) = Robots.rulesFor("::::\nDisallow /x\nnonsense", "x")
    assert(Robots.allowed("/x", a3, d3))
  }

  test("O58 gate: rules parse once per host, urls verdict via broadcast join; missing robots allowed") {
    val robots = Seq(
      ("site-a.example.com", robotsTxt),
      ("site-b.example.com", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "robots_txt")
    val rules = Politeness.robotsRules(robots, agent = "graftbot")
    val urls = Seq(
      (1L, "https://site-a.example.com/private/x"),
      (2L, "https://site-a.example.com/private/press/ok"),
      (3L, "https://SITE-B.example.com/anything"),
      (4L, "https://no-robots.example.org/free")
    ).toDF("id", "url")
    val got = Politeness.withRobotsVerdict(urls, rules)
      .orderBy($"id").select($"robots_allowed").as[Boolean].collect().toSeq
    assert(got == Seq(false, true, false, true), s"got $got")
    // the rules side is the broadcast side
    val plan = Politeness.withRobotsVerdict(urls, rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rules join not broadcast:\n${plan.take(500)}")
    // SQL surface registered
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT robots_allowed('/private/press/x', rr.allow, rr.disallow) AS a, " +
        "robots_allowed('/private/x', rr.allow, rr.disallow) AS b FROM " +
        s"(SELECT robots_rules('${robotsTxt.replace("\n", "\\n").replace("'", "''")}', 'graftbot') AS rr)")
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("withHttpMeta: status + mime from captures; NULLs for non-HTTP") {
    val rows = Seq(
      (1, "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\nbody".getBytes("UTF-8")),
      (2, "HTTP/1.1 404 Not Found\nContent-Type: TEXT/Plain\n\nnope".getBytes("UTF-8")),
      (3, "not an http message".getBytes("UTF-8"))
    ).toDF("i", "payload")
    val got = HttpPayload.withHttpMeta(rows, "payload").orderBy($"i")
      .select($"http_status", $"mime_type").collect()
      .map(r => (Option(r.get(0)), Option(r.getString(1)))).toSeq
    assert(got == Seq(
      (Some(200), Some("text/html")),
      (Some(404), Some("text/plain")),
      (None, None)), s"got $got")
  }
}
