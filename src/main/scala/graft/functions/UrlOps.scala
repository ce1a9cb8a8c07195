package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** One-pass JVM URL engine behind the X22–X24 expressions — the
  * codegen replacement for the regexp_extract/when-chain columnar
  * formulation of t35/t36 ([[graft.operators.UrlCuration]] keeps
  * that chain as the parity reference and the DuckDB oracle twin).
  *
  * Why an expression: the columnar chain is semantically fine but
  * catastrophically heavy as a CATALYST TREE — host/port/path/query
  * each re-derive the scheme/authority regexes, the PSL reduction
  * probes 3 label tails against ~190-literal isin lists, and the
  * optimizer inlines the whole forest into every reference: measured
  * in round 16 at 1,326 RegExpExtract nodes (1.26 MB serialized) for
  * ONE gate projection, 22k nodes after the recrawl agg, 39.8 MiB
  * task binaries after the dedup fan-out, whole-stage codegen
  * falling back ("Code grows beyond 64 KB") and seconds of driver
  * planning per micro-batch. X22–X24 are ONE tree node each; the
  * parse is a single forward scan; the PSL probes are hash-set
  * lookups.
  *
  * Semantics are BYTE-EQUAL to the columnar chain by construction —
  * including its regex backtracking quirks (last-'@' userinfo with
  * fallback when the host after it is empty/invalid; bracketed-host
  * alternation; port digits that must reach the authority end) —
  * and UrlParityFuzzSpec pins equality over adversarial generators.
  */
object UrlOps {

  // ---- scheme ----

  private def isAlpha(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  private def isSchemeChar(c: Char) =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  /** Index just past "://", or -1 when the value has no scheme frame. */
  private def authStart(u: String): Int = {
    if (u == null || u.isEmpty || !isAlpha(u.charAt(0))) return -1
    var i = 1
    while (i < u.length && isSchemeChar(u.charAt(i))) i += 1
    if (u.regionMatches(i, "://", 0, 3)) i + 3 else -1
  }

  private def authorityEnd(u: String, from: Int): Int = {
    var i = from
    while (i < u.length) {
      val c = u.charAt(i)
      if (c == '/' || c == '?' || c == '#') return i
      i += 1
    }
    u.length
  }

  // ---- host (the regex `(?:[^/?#]*@)?(\[[^\]/?#@]*\]|[^/:?#@]+)`) ----

  /** Host candidate starting at position p of the authority: the
    * bracketed alternative first (fails on '@' or a missing ']'),
    * then the generic run (stops at ':' or '@'); null if empty.
    */
  private def hostAt(auth: String, p: Int): String = {
    if (p >= auth.length) return null
    if (auth.charAt(p) == '[') {
      var k = p + 1
      while (k < auth.length && auth.charAt(k) != ']' && auth.charAt(k) != '@') k += 1
      if (k < auth.length && auth.charAt(k) == ']') return auth.substring(p, k + 1)
    }
    var k = p
    while (k < auth.length && auth.charAt(k) != ':' && auth.charAt(k) != '@') k += 1
    if (k > p) auth.substring(p, k) else null
  }

  /** The regex's userinfo backtracking: longest `...@` prefix first
    * (last '@'), earlier '@'s next, no-userinfo last — first choice
    * that yields a host wins.
    */
  private def rawHost(auth: String): String = {
    var a = auth.lastIndexOf('@')
    while (a >= 0) {
      val h = hostAt(auth, a + 1)
      if (h != null) return h
      a = auth.lastIndexOf('@', a - 1)
    }
    hostAt(auth, 0)
  }

  /** Lowercased, FQDN-dot-stripped host; null when unparseable. */
  def hostOf(url: UTF8String): UTF8String = {
    if (url == null) return null
    val u = url.toString
    val s = authStart(u)
    if (s < 0) return null
    val h0 = rawHost(u.substring(s, authorityEnd(u, s)))
    if (h0 == null) return null
    var end = h0.length
    while (end > 0 && h0.charAt(end - 1) == '.') end -= 1
    if (end == 0) return null
    // UTF8String.toLowerCase == Spark's lower() exactly
    UTF8String.fromString(h0.substring(0, end)).toLowerCase
  }

  // ---- port (regex `(?:\[...\]|[^/:?#@]+):([0-9]+)(?:[/?#]|$)`) ----

  private def allDigits(s: String, from: Int): Boolean = {
    if (from >= s.length) return false
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  /** Port after a host candidate at p: the digits must run to the
    * authority end (the regex's `[/?#]|$` terminator). Tries the
    * bracketed parse, then the generic run — the alternation
    * backtracks independently of [[rawHost]]'s choice.
    */
  private def portAt(auth: String, p: Int): String = {
    if (p >= auth.length) return null
    if (auth.charAt(p) == '[') {
      var k = p + 1
      while (k < auth.length && auth.charAt(k) != ']' && auth.charAt(k) != '@') k += 1
      if (k < auth.length && auth.charAt(k) == ']' &&
          k + 1 < auth.length && auth.charAt(k + 1) == ':' &&
          allDigits(auth, k + 2))
        return auth.substring(k + 2)
    }
    var k = p
    while (k < auth.length && auth.charAt(k) != ':' && auth.charAt(k) != '@') k += 1
    if (k > p && k < auth.length && auth.charAt(k) == ':' && allDigits(auth, k + 1))
      auth.substring(k + 1)
    else null
  }

  private def portOf(auth: String): String = {
    var a = auth.lastIndexOf('@')
    while (a >= 0) {
      val p = portAt(auth, a + 1)
      if (p != null) return p
      a = auth.lastIndexOf('@', a - 1)
    }
    val p = portAt(auth, 0)
    if (p == null) "" else p
  }

  // ---- canonical url (t36's normalization, one pass) ----

  private val Tracking = Array("gclid", "fbclid")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = if (eq < 0) param else param.substring(0, eq)
    key.startsWith("utm_") || Tracking.contains(key)
  }

  def canonicalUrl(url: UTF8String): UTF8String = {
    if (url == null) return null
    val u = url.toString
    val s = authStart(u)
    if (s < 0) return null
    val ae = authorityEnd(u, s)
    val auth = u.substring(s, ae)
    val h0 = rawHost(auth)
    if (h0 == null) return null
    var hEnd = h0.length
    while (hEnd > 0 && h0.charAt(hEnd - 1) == '.') hEnd -= 1
    if (hEnd == 0) return null
    val host = UTF8String.fromString(h0.substring(0, hEnd)).toLowerCase.toString
    val scheme = u.substring(0, s - 3).toLowerCase(java.util.Locale.ROOT) // ASCII by class
    val port = portOf(auth)
    val portPart =
      if (port.isEmpty || (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443")) ""
      else ":" + port
    // path: from the authority end to the first '?' or '#'
    var pEnd = ae
    while (pEnd < u.length && u.charAt(pEnd) != '?' && u.charAt(pEnd) != '#') pEnd += 1
    val path0 = u.substring(ae, pEnd)
    val path = if (path0.isEmpty) "/" else path0
    // query: from the FIRST '?' (before any '#') to the next '#'
    val hi = u.indexOf('#')
    val qi = u.indexOf('?')
    val query =
      if (qi < 0 || (hi >= 0 && hi < qi)) ""
      else {
        val qEnd = { val k = u.indexOf('#', qi); if (k < 0) u.length else k }
        val parts = u.substring(qi + 1, qEnd).split("&", -1)
          .filter(x => x.nonEmpty && !isTracking(x))
        // sort_array ordering == UTF8String binary order
        val keys = parts.map(UTF8String.fromString)
        java.util.Arrays.sort(keys, (a: UTF8String, b: UTF8String) => a.compareTo(b))
        keys.map(_.toString).mkString("&")
      }
    UTF8String.fromString(
      scheme + "://" + host + portPart + path +
        (if (query.isEmpty) "" else "?" + query))
  }

  // ---- reference resolution (X25: resolve_url(base, href)) ----

  /** RFC 3986 §5.2.4 remove_dot_segments over a path that starts with
    * '/' (or is empty): '.' segments vanish, '..' pops the previous
    * segment ('..' at the root is dropped, per the RFC), and a
    * trailing '.'/'..' leaves the trailing slash. Empty segments
    * ("a//b") are preserved — they are real (empty-named) segments.
    */
  private[functions] def removeDotSegments(path: String): String = {
    if (path.isEmpty || (path.indexOf("/.") < 0 && !path.startsWith(".")))
      return path
    val segs = path.split("/", -1)
    val stack = new scala.collection.mutable.ArrayBuffer[String](segs.length)
    var trailingSlash = false
    var i = if (path.charAt(0) == '/') 1 else 0
    while (i < segs.length) {
      val s = segs(i)
      if (s == ".") trailingSlash = true
      else if (s == "..") {
        if (stack.nonEmpty) stack.remove(stack.size - 1)
        trailingSlash = true
      } else {
        stack += s
        trailingSlash = false
      }
      i += 1
    }
    var out = "/" + stack.mkString("/")
    if (trailingSlash && !out.endsWith("/")) out += "/"
    out
  }

  /** True when the value starts with `scheme:` (RFC 3986 scheme
    * production) — used to classify hrefs: `scheme://` is an absolute
    * hierarchical reference, a bare `scheme:` (mailto:, javascript:,
    * data:, tel:) is opaque and yields no fetchable target.
    */
  private def schemeColonEnd(u: String): Int = {
    if (u.isEmpty || !isAlpha(u.charAt(0))) return -1
    var i = 1
    while (i < u.length && isSchemeChar(u.charAt(i))) i += 1
    if (i < u.length && u.charAt(i) == ':') i else -1
  }

  /** Dot-normalize the PATH of an absolute hierarchical URL; the
    * query (fragments were stripped upstream) passes through.
    */
  private def finishResolved(u: String): UTF8String = {
    val s = authStart(u)
    if (s < 0) return null
    val ae = authorityEnd(u, s)
    var pEnd = ae
    while (pEnd < u.length && u.charAt(pEnd) != '?') pEnd += 1
    UTF8String.fromString(
      u.substring(0, ae) + removeDotSegments(u.substring(ae, pEnd)) +
        u.substring(pEnd))
  }

  /** Resolve an href against the page URL it was extracted from —
    * the WAT-extraction primitive (RFC 3986 §5.2.2, restricted to the
    * crawlable subset). Returns NULL for non-targets: empty or
    * fragment-only hrefs (same page) and opaque `scheme:` hrefs
    * (mailto:/javascript:/data:/tel:). Absolute `scheme://` hrefs
    * pass through (their own authority); `//host/p` takes the base
    * scheme; `/p` takes the base scheme+authority; anything else
    * merges with the base directory. The fragment is stripped and the
    * merged path is dot-normalized (remove_dot_segments, exact — not
    * a bounded approximation); scheme/host case and the query are
    * preserved verbatim for [[canonicalUrl]] downstream. Leading and
    * trailing ASCII whitespace in the href is trimmed (the browser
    * rule). NULL when the base itself has no `scheme://` frame.
    */
  def resolveUrl(base: UTF8String, href: UTF8String): UTF8String = {
    if (base == null || href == null) return null
    var h = href.toString
    // ASCII-whitespace trim (String.trim: all chars <= U+0020)
    h = h.trim
    val hashIdx = h.indexOf('#')
    if (hashIdx >= 0) h = h.substring(0, hashIdx)
    if (h.isEmpty) return null
    if (authStart(h) >= 0) return finishResolved(h)
    if (schemeColonEnd(h) >= 0) return null // opaque scheme (mailto:, javascript:)
    val b = base.toString
    val sB = authStart(b)
    if (sB < 0) return null
    val aeB = authorityEnd(b, sB)
    if (h.startsWith("//"))
      return finishResolved(b.substring(0, sB - 2) + h) // scheme + ':' + href
    val schemeAuth = b.substring(0, aeB)
    if (h.startsWith("/")) return finishResolved(schemeAuth + h)
    var pEndB = aeB
    while (pEndB < b.length && b.charAt(pEndB) != '?' && b.charAt(pEndB) != '#') pEndB += 1
    val basePath = b.substring(aeB, pEndB)
    // query-only reference (RFC 3986 §5.2.2, empty ref path + query):
    // the base's WHOLE path is kept — '?page=2' on '/a/list.html'
    // means '/a/list.html?page=2', not the directory
    if (h.startsWith("?"))
      return finishResolved(schemeAuth + (if (basePath.isEmpty) "/" else basePath) + h)
    // merge with the base directory (base path up to its last '/';
    // an authority-only base contributes '/')
    val cut = basePath.lastIndexOf('/')
    val dir = if (cut < 0) "/" else basePath.substring(0, cut + 1)
    finishResolved(schemeAuth + dir + h)
  }

  // ---- registrable domain (PSL, hash-set probes) ----

  private def setsByLen(m: Map[Int, Seq[String]]): Map[Int, java.util.HashSet[String]] =
    m.map { case (k, v) =>
      val s = new java.util.HashSet[String](v.size * 2)
      v.foreach(s.add); k -> s
    }

  private lazy val normal = setsByLen(PslRules.Normal)
  private lazy val wildBases = setsByLen(PslRules.WildBases)
  private lazy val exceptions = setsByLen(PslRules.Exceptions)

  private def isIpv4ish(h: String): Boolean = {
    // the columnar twin's `^[0-9]+(\.[0-9]+){3}$`
    var groups = 0
    var digits = 0
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      else if (c == '.') {
        if (digits == 0) return false
        groups += 1; digits = 0
      } else return false
      i += 1
    }
    groups == 3 && digits > 0
  }

  def registrableDomain(host: UTF8String): UTF8String = {
    if (host == null) return null
    val h = host.toString
    if (h.startsWith("[") || isIpv4ish(h)) return host
    // Spark split(host, "\\.") keeps trailing empties (limit -1)
    val labels = h.split("\\.", -1)
    val n = labels.length
    def tail(k: Int): String = {
      val sb = new java.lang.StringBuilder()
      var i = n - k
      while (i < n) {
        if (i > n - k) sb.append('.')
        sb.append(labels(i)); i += 1
      }
      sb.toString
    }
    def hit(sets: Map[Int, java.util.HashSet[String]], baseLen: Int, k: Int): Boolean =
      n >= k && sets.get(baseLen).exists(_.contains(tail(baseLen)))
    var excK = 0
    var k = 3
    while (k >= 2 && excK == 0) { if (hit(exceptions, k, k)) excK = k; k -= 1 }
    var matchK = 0
    k = 3
    while (k >= 1 && matchK == 0) {
      if (hit(normal, k, k) || (k >= 2 && hit(wildBases, k - 1, k))) matchK = k
      k -= 1
    }
    val suffixLen = if (excK > 0) excK - 1 else if (matchK > 0) matchK else 1
    val matched = excK > 0 || matchK > 0
    if (suffixLen >= n) { if (matched) null else host }
    else UTF8String.fromString(tail(suffixLen + 1))
  }
}
