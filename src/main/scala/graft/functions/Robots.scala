package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 (robots.txt) rule engine — the runtime behind the X20/X21
  * expressions: a crawl pipeline's POLITENESS gate (the provenance
  * companion to the t35 blocklist: a domain may be allowed and still
  * forbid specific paths).
  *
  * Semantics implemented per RFC 9309:
  *  - groups select by user-agent token, case-insensitive substring
  *    product token match; the MOST SPECIFIC matching group wins
  *    (longest matching agent token), `*` is the fallback group;
  *    consecutive user-agent lines share one group;
  *  - within the chosen group, the rule with the LONGEST matching
  *    pattern decides; allow wins ties; no match → allowed;
  *  - patterns support `*` (any run) and a terminal `$` anchor;
  *  - empty Disallow matches nothing (the classic "allow all" form);
  *  - unknown directives and comments (#) are ignored.
  *
  * Deterministic and total: malformed lines are skipped, never
  * thrown on.
  */
object Robots {

  /** (allowPatterns, disallowPatterns) for the group governing
    * `agent` — group selection resolved HERE so the per-url check is
    * pure pattern matching.
    */
  def rulesFor(txt: String, agent: String): (Seq[String], Seq[String]) = {
    val agentLc = agent.toLowerCase
    // parse into groups: (agentTokens, rules)
    var groups = List.empty[(List[String], List[(Boolean, String)])]
    var curAgents = List.empty[String]
    var curRules = List.empty[(Boolean, String)]
    var inAgentRun = false // consecutive user-agent lines accumulate
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups ::= (curAgents.reverse, curRules.reverse)
      curAgents = Nil; curRules = Nil
    }
    (if (txt == null) "" else txt).split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" if value.nonEmpty =>
            // empty product tokens are invalid per RFC 9309 — and an
            // empty token would substring-match EVERY agent, silently
            // hijacking the '*' fallback group's rules
            if (!inAgentRun) flush()
            curAgents ::= value.toLowerCase
            inAgentRun = true
          case "allow" =>
            inAgentRun = false
            if (curAgents.nonEmpty) curRules ::= (true, value)
          case "disallow" =>
            inAgentRun = false
            if (curAgents.nonEmpty) curRules ::= (false, value)
          case _ => inAgentRun = false // crawl-delay, sitemap, unknown
        }
      }
    }
    flush()
    // most specific matching group: longest agent token that is a
    // prefix-ish (substring per RFC product-token practice) of ours
    val matching = groups.flatMap { case (agents, rules) =>
      agents.collect {
        case a if a.nonEmpty && a != "*" && agentLc.contains(a) => (a.length, rules)
      }
    }
    // RFC 9309 §2.2.1: rules of groups matching at the SAME (most
    // specific) token combine — a robots.txt that declares two
    // groups for one product token means the union of both
    val chosen: List[(Boolean, String)] =
      if (matching.nonEmpty) {
        val best = matching.map(_._1).max
        matching.filter(_._1 == best).flatMap(_._2)
      } else groups.filter(_._1.contains("*")).flatMap(_._2)
    val (allow, disallow) = chosen.partition(_._1)
    (allow.map(_._2).filter(_.nonEmpty), disallow.map(_._2).filter(_.nonEmpty))
  }

  /** Does `pattern` (with `*` runs and optional terminal `$`) match a
    * PREFIX of `path`? Returns the matched length (the RFC's
    * specificity measure: octets of the pattern, `*`/`$` included)
    * or -1.
    */
  private[graft] def matchLen(path: String, pattern: String): Int = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1) // literal segments between stars
    // first segment anchors as a prefix
    if (!path.startsWith(parts(0))) return -1
    var pos = parts(0).length
    if (parts.length == 1)
      return if (anchored && pos != path.length) -1 else pattern.length
    // middle segments: leftmost match (optimal for existence — the
    // earliest middle leaves maximal room for the last segment);
    // EMPTY middles ('**') are no-ops, not jump-to-end
    var i = 1
    while (i < parts.length - 1) {
      val seg = parts(i)
      if (seg.nonEmpty) {
        val at = path.indexOf(seg, pos)
        if (at < 0) return -1
        pos = at + seg.length
      }
      i += 1
    }
    // last segment: a '$' anchor means SUFFIX match (not "wherever
    // the first occurrence landed" — '/*.php$' must match
    // '/index.php.php'); a trailing '*' matches any run
    val last = parts(parts.length - 1)
    if (last.isEmpty) pattern.length
    else if (anchored) {
      if (path.endsWith(last) && path.length - last.length >= pos) pattern.length
      else -1
    } else if (path.indexOf(last, pos) >= 0) pattern.length
    else -1
  }

  /** RFC 9309 decision for a path under (allow, disallow) patterns:
    * longest match wins, allow wins ties, no match → allowed.
    */
  def allowed(path: String, allow: Seq[String], disallow: Seq[String]): Boolean = {
    val p = if (path == null || path.isEmpty) "/" else path
    val bestAllow = allow.foldLeft(-1)((b, r) => math.max(b, matchLen(p, r)))
    val bestDis = disallow.foldLeft(-1)((b, r) => math.max(b, matchLen(p, r)))
    bestDis < 0 || bestAllow >= bestDis
  }

  // ---- UTF8String entries shared by eval and generated code ----

  def rulesStruct(txt: UTF8String, agent: UTF8String): (Array[UTF8String], Array[UTF8String]) = {
    val (a, d) = rulesFor(
      if (txt == null) "" else txt.toString,
      if (agent == null) "*" else agent.toString)
    (a.map(UTF8String.fromString).toArray, d.map(UTF8String.fromString).toArray)
  }

  def allowedU(path: UTF8String,
      allow: org.apache.spark.sql.catalyst.util.ArrayData,
      disallow: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    def toSeq(arr: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
      if (arr == null) Nil
      else (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    allowed(if (path == null) "/" else path.toString, toSeq(allow), toSeq(disallow))
  }
}
