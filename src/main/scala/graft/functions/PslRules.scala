package graft.functions

/** The committed public-suffix-list snapshot subset (see
  * [[graft.operators.Psl]] for the algorithm docs and the DuckDB
  * twin) — hosted here so both the columnar reference formulation
  * (operators.Psl) and the X24 JVM engine ([[UrlOps]]) derive from
  * ONE rule Seq; a full-PSL refresh is still a one-Seq swap.
  * Upstream syntax: leading `*.` = wildcard, `!` = exception.
  */
object PslRules {

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

  val Normal: Map[Int, Seq[String]] =
    Rules.filterNot(r => r.startsWith("*.") || r.startsWith("!")).groupBy(labels)
  val WildBases: Map[Int, Seq[String]] =
    Rules.filter(_.startsWith("*.")).map(_.drop(2)).groupBy(labels)
  val Exceptions: Map[Int, Seq[String]] =
    Rules.filter(_.startsWith("!")).map(_.drop(1)).groupBy(labels)
}
