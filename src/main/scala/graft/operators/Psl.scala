package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-suffix-list eTLD+1 reduction (t35's registrable-domain
  * core) with FULL rule semantics — normal rules, wildcard rules
  * (`*.ck`), exception rules (`!www.ck`) — per the publicsuffix.org
  * algorithm:
  *
  *  - a rule matches when its labels are a suffix of the host's
  *    labels (`*` matches exactly one label);
  *  - the prevailing rule is the matching exception rule if any,
  *    else the LONGEST matching rule, else the default rule `*`;
  *  - an exception rule's public suffix is the rule minus its
  *    leftmost label;
  *  - registrable domain = public suffix + one more label; a host
  *    that IS a public suffix has none (NULL → `invalid` verdict).
  *
  * [[Rules]] is a committed SNAPSHOT SUBSET of the list (the common
  * ICANN ccSLDs, the high-traffic private-section suffixes, the
  * wildcard/exception families) — ~190 rules vs ~9k upstream; the
  * swap point for a full refresh is this one Seq (same syntax as the
  * upstream file: leading `*.` and `!` markers). Documented
  * divergences from strict PSL, both deliberate:
  *  - a single-label host matching NO explicit rule passes through
  *    whole (`localhost` stays blockable as itself; strict PSL's
  *    default rule would void it);
  *  - IP literals (bracketed IPv6, dotted IPv4) pass through whole —
  *    the address is the blockable unit.
  *
  * Scale shape: the rule set compiles into literal `isin` tests over
  * the host's last 1–3 label tails — pure codegen'd per-row work, no
  * join, no shuffle, engine-replayable (the DuckDB twin is generated
  * from the SAME rule data, so t35 stays fully oracle-gated). A
  * full-PSL deployment (9k rules) would swap the isin literals for a
  * broadcast map lookup; the tail/priority logic is unchanged.
  */
object Psl {

  /** Snapshot subset of the public suffix list (publicsuffix.org,
    * ICANN + private sections), upstream syntax. Max 3 labels per
    * rule (wildcard bases max 2) — [[registrableDomain]] sizes its
    * tail probes from these bounds at compile time.
    */
  val Rules: Seq[String] = Seq(
    // ICANN: generic + common ccTLD second-levels
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "me",
    "dev", "app", "ai", "uk", "jp", "au", "br", "in", "nz", "za", "kr",
    "mx", "ar", "tr", "il", "cn", "tw", "hk", "sg", "my", "th", "id",
    "ph", "vn", "ua", "ru", "pl", "de", "fr", "es", "it", "nl", "se",
    "no", "fi", "dk", "ch", "at", "be", "pt", "gr", "cz", "ca", "us",
    "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz", "gen.nz",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr", "hs.kr", "ms.kr",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "tur.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "bel.tr", "biz.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "k12.il", "muni.il",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "name.my",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "my.id",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "ac.vn", "biz.vn",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.ru", "msk.ru", "spb.ru",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl",
    "com.eg", "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "com.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "on.ca", "qc.ca", "bc.ca", "ab.ca", "mb.ca", "ns.ca", "sk.ca", "nb.ca", "gc.ca",
    "k12.ca.us", "cc.ca.us", "k12.ny.us", "k12.tx.us",
    // private section (high-traffic hosting suffixes)
    "blogspot.com", "github.io", "gitlab.io", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudfront.net", "appspot.com", "pages.dev",
    "workers.dev", "wordpress.com", "tumblr.com", "weebly.com",
    "wixsite.com", "onrender.com", "surge.sh", "readthedocs.io",
    "neocities.org", "deno.dev", "fly.dev", "glitch.me", "hf.space",
    "s3.amazonaws.com",
    // wildcard families
    "*.ck", "*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    // exception rules
    "!www.ck",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp"
  )

  private def labels(r: String): Int = r.count(_ == '.') + 1

  private[operators] val Normal: Map[Int, Seq[String]] =
    Rules.filterNot(r => r.startsWith("*.") || r.startsWith("!"))
      .groupBy(labels)
  private[operators] val WildBases: Map[Int, Seq[String]] =
    Rules.filter(_.startsWith("*.")).map(_.drop(2)).groupBy(labels)
  private[operators] val Exceptions: Map[Int, Seq[String]] =
    Rules.filter(_.startsWith("!")).map(_.drop(1)).groupBy(labels)

  /** Longest normal/private rule (suffix label bound for the probes). */
  private val MaxK = (Normal.keys ++ WildBases.keys.map(_ + 1) ++
    Exceptions.keys).max

  require(MaxK <= 3, s"registrableDomain tails sized for <=3-label suffixes, rules need $MaxK")

  /** Registrable domain (eTLD+1) of a lowercased host under [[Rules]].
    * NULL for hosts that ARE a public suffix; IP literals and
    * rule-less single-label hosts pass through whole (scaladoc above).
    */
  def registrableDomain(host: Column): Column = {
    val arr = split(host, "\\.")
    val n = size(arr)
    // tail(k) = last k labels; element_at(-i) is NULL past the front,
    // and concat_ws SKIPS nulls — every use is therefore n>=k guarded
    def tail(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(arr, -i)): _*)
    def inSet(c: Column, s: Seq[String]): Column =
      if (s.isEmpty) lit(false) else c.isin(s: _*)
    def hit(k: Int, cond: Column): Column =
      when(n >= k && cond, lit(k)).otherwise(lit(0))
    val normK = (1 to 3).map(k => hit(k, inSet(tail(k), Normal.getOrElse(k, Nil))))
    val wildK = (2 to 3).map(k => hit(k, inSet(tail(k - 1), WildBases.getOrElse(k - 1, Nil))))
    val excK = greatest(
      (2 to 3).map(k => hit(k, inSet(tail(k), Exceptions.getOrElse(k, Nil)))): _*)
    val matchK = greatest((normK ++ wildK): _*)
    val suffixLen = when(excK > 0, excK - 1)
      .when(matchK > 0, matchK).otherwise(lit(1))
    val matched = excK > 0 || matchK > 0
    when(host.isNull, lit(null))
      .when(host.startsWith("[") || host.rlike("^[0-9]+(\\.[0-9]+){3}$"), host)
      .when(suffixLen >= n, when(matched, lit(null)).otherwise(host))
      .when(suffixLen === 1, tail(2))
      .when(suffixLen === 2, tail(3))
      .otherwise(tail(4))
  }

  /** DuckDB twin of [[registrableDomain]] over host expression `e` —
    * generated from the SAME rule data, so the two engines cannot
    * drift rule-by-rule.
    */
  def duckRegistrableDomain(e: String): String = {
    val parts = s"string_split($e, '.')"
    val n = s"len($parts)"
    def tail(k: Int) = s"array_to_string(list_slice($parts, -$k, -1), '.')"
    def inList(s: Seq[String]) = s.map(x => s"'$x'").mkString("(", ", ", ")")
    def hit(k: Int, cond: String) = s"CASE WHEN $n >= $k AND $cond THEN $k ELSE 0 END"
    val normK = (1 to 3).flatMap(k =>
      Normal.get(k).map(s => hit(k, s"${tail(k)} IN ${inList(s)}")))
    val wildK = (2 to 3).flatMap(k =>
      WildBases.get(k - 1).map(s => hit(k, s"${tail(k - 1)} IN ${inList(s)}")))
    val excK = "GREATEST(" + (2 to 3).flatMap(k =>
      Exceptions.get(k).map(s => hit(k, s"${tail(k)} IN ${inList(s)}")))
      .mkString(", ") + ", 0)"
    val matchK = "GREATEST(" + (normK ++ wildK).mkString(", ") + ")"
    val suffixLen =
      s"CASE WHEN $excK > 0 THEN $excK - 1 WHEN $matchK > 0 THEN $matchK ELSE 1 END"
    val matched = s"($excK > 0 OR $matchK > 0)"
    s"""CASE WHEN $e IS NULL THEN NULL
       WHEN starts_with($e, '[') OR regexp_matches($e, '^[0-9]+(\\.[0-9]+){3}$$') THEN $e
       WHEN $suffixLen >= $n THEN (CASE WHEN $matched THEN NULL ELSE $e END)
       WHEN $suffixLen = 1 THEN ${tail(2)}
       WHEN $suffixLen = 2 THEN ${tail(3)}
       ELSE ${tail(4)} END"""
  }
}
